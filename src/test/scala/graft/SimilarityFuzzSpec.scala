package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.SimilarityOps

/** Differential fuzz of the similarity tier against brute-force in-JVM
  * references. The oracle gate already pins these ops against DuckDB on the
  * driver corpus; HERE the reference replays the DECLARED arithmetic
  * contract — sequential-fold dot (the DotProduct kernel order), the
  * baseVectors zero-norm exclusion, Spark's HALF_UP double rounding, the
  * quantizer clamp with Spark's NaN-largest least/greatest — on random
  * corpora the driver data never produces: exact duplicate vectors (raw-sim
  * ties), negated and scaled copies, disjoint-support sparse vectors (sim
  * exactly +0.0), zero vectors, NULL embeddings, 1e30/1e-6 magnitudes, and
  * (for the quantizer) NaN/±Inf components. Everything is compared as exact
  * values — the references compute the same doubles bit-for-bit, so any
  * reordering, lost exclusion, or changed tie-break is a hard mismatch.
  */
class SimilarityFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  private val Dim   = SimilarityOps.Dim

  // --- reference arithmetic (the declared contract, independently replayed) --

  /** Sequential fold, index 0 → n-1 — the DotProductKernel order. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i   = 0
    val n   = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Spark Round(HALF_UP) on DOUBLE: the scala-BigDecimal(toString) route. */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Spark least/greatest order NaN as the LARGEST double. */
  private def sparkLeast(a: Double, b: Double): Double =
    if (a.isNaN) b else if (b.isNaN) a else math.min(a, b)
  private def sparkGreatest(a: Double, b: Double): Double =
    if (a.isNaN) b else if (b.isNaN) a else math.max(a, b)

  /** The lshBuckets quantizer: ×1000, clamp ±9e15 (NaN → 9e15), HALF_UP. */
  private def quant(x: Float): Long = {
    val clamped = sparkGreatest(sparkLeast(x.toDouble * SimilarityOps.Quant, 9.0e15), -9.0e15)
    BigDecimal(clamped).setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble.toLong
  }

  private def refBucket(v: Array[Float]): Long =
    if (v == null) 0L
    else {
      val q = v.map(quant)
      SimilarityOps.hyperplanes.zipWithIndex.foldLeft(0L) { case (acc, (h, j)) =>
        var d = 0L
        var i = 0
        while (i < Dim) { d += q(i) * h(i); i += 1 }
        if (d > 0) acc | (1L << j) else acc
      }
    }

  /** (vec_id, v, n2) over vectors with a direction — the baseVectors twin. */
  private def refBase(docs: Seq[(Long, Array[Float])]): Seq[(Long, Array[Double], Double)] =
    docs.collect { case (id, v) if v != null => (id, v.map(_.toDouble)) }
      .map { case (id, vd) => (id, vd, dot(vd, vd)) }
      .filter(_._3 > 0)

  /** Descending raw sim, vec_id tie-break — the declared ranking order. */
  private val rankOrd: Ordering[(Long, Double)] =
    Ordering.by[(Long, Double), (Double, Long)](t => (-t._2, t._1))

  private def refTopK(
      docs: Seq[(Long, Array[Float])], qids: Seq[Long], k: Int
  ): Seq[(Long, Long, Long, Double)] = {
    val base = refBase(docs)
    base.filter(t => qids.contains(t._1)).sortBy(_._1).flatMap { case (qid, qv, qn2) =>
      base.map { case (id, v, n2) => (id, dot(v, qv) / (math.sqrt(qn2) * math.sqrt(n2))) }
        .sorted(rankOrd)
        .take(k)
        .zipWithIndex
        .map { case ((id, s), r) => (qid, (r + 1).toLong, id, round6(s)) }
    }
  }

  /** Argmax cell per base vector: sim DESC, centroid_id ASC. */
  private def refAssign(
      docs: Seq[(Long, Array[Float])], cents: Array[Array[Double]]
  ): Seq[(Long, Long, Double)] = {
    val cn2 = cents.map(c => dot(c, c))
    refBase(docs).map { case (id, v, n2) =>
      val (cid, s) = cents.zipWithIndex.map { case (c, i) =>
        (i.toLong, dot(v, c) / (math.sqrt(n2) * math.sqrt(cn2(i))))
      }.map(t => (t._1, t._2)).minBy(t => (-t._2, t._1))
      (id, cid, s)
    }.sortBy(_._1)
  }

  private def refIvfTopK(
      docs: Seq[(Long, Array[Float])], cents: Array[Array[Double]],
      qids: Seq[Long], k: Int, nprobe: Int
  ): Seq[(Long, Long, Long, Double)] = {
    val base  = refBase(docs)
    val cn2   = cents.map(c => dot(c, c))
    def centSims(v: Array[Double], n2: Double): Seq[(Long, Double)] =
      cents.indices.map(i => (i.toLong, dot(v, cents(i)) / (math.sqrt(n2) * math.sqrt(cn2(i)))))
    val cell = base.map { case (id, v, n2) => id -> centSims(v, n2).minBy(t => (-t._2, t._1))._1 }.toMap
    base.filter(t => qids.contains(t._1)).sortBy(_._1).flatMap { case (qid, qv, qn2) =>
      val probeCells = centSims(qv, qn2).sortBy(t => (-t._2, t._1)).take(nprobe).map(_._1).toSet
      base.filter { case (id, _, _) => probeCells(cell(id)) }
        .map { case (id, v, n2) => (id, dot(v, qv) / (math.sqrt(qn2) * math.sqrt(n2))) }
        .sorted(rankOrd)
        .take(k)
        .zipWithIndex
        .map { case ((id, s), r) => (qid, (r + 1).toLong, id, round6(s)) }
    }
  }

  private def refAnnTopK(
      docs: Seq[(Long, Array[Float])], qids: Seq[Long], k: Int, maxHamming: Int
  ): Seq[(Long, Long, Long, Double)] = {
    val base = refBase(docs)
    val bucket = docs.collect { case (id, v) if v != null => id -> refBucket(v) }.toMap
    base.filter(t => qids.contains(t._1)).sortBy(_._1).flatMap { case (qid, qv, qn2) =>
      base.filter { case (id, _, _) =>
        java.lang.Long.bitCount(bucket(id) ^ bucket(qid)) <= maxHamming
      }
        .map { case (id, v, n2) => (id, dot(v, qv) / (math.sqrt(qn2) * math.sqrt(n2))) }
        .sorted(rankOrd)
        .take(k)
        .zipWithIndex
        .map { case ((id, s), r) => (qid, (r + 1).toLong, id, round6(s)) }
    }
  }

  // --- corpora ---------------------------------------------------------------

  /** Random corpus with planted degeneracies. `hostileFloats` injects
    * NaN/±Inf components — only the quantizer test feeds those (cosine over
    * non-finite components is outside the embedding data model; the
    * baseVectors n2 filter drops NaN rows and the adversarial-corpus gate
    * owns the cross-engine story there).
    */
  private def corpus(seed: Long, hostileFloats: Boolean = false): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    def randVec(scale: Double): Array[Float] =
      Array.fill(Dim)(((rnd.nextDouble() - 0.5) * scale).toFloat)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
    def earlier(): Option[Array[Float]] = {
      val nonNull = buf.collect { case (_, v) if v != null => v }
      if (nonNull.isEmpty) None else Some(nonNull(rnd.nextInt(nonNull.size)))
    }
    val n = 20 + rnd.nextInt(30)
    for (i <- 0 until n) {
      val v: Array[Float] = rnd.nextInt(14) match {
        case 0 => null
        case 1 => Array.fill(Dim)(0f)
        case 2 => earlier().map(_.clone()).getOrElse(randVec(1.0))           // exact dup → raw-sim tie
        case 3 => earlier().map(_.map(x => -x)).getOrElse(randVec(1.0))      // antipode
        case 4 => earlier().map(_.map(x => x * 2f)).getOrElse(randVec(1.0))  // same direction
        case 5 | 6 =>                                                        // sparse; disjoint supports → sim +0.0
          val v = Array.fill(Dim)(0f)
          val lo = rnd.nextInt(Dim - 4)
          for (j <- lo until lo + 3) v(j) = (rnd.nextDouble() - 0.5).toFloat
          v
        case 7 => randVec(1e30)
        case 8 => randVec(1e-6)
        case 9 if hostileFloats =>
          val v = randVec(1.0)
          v(rnd.nextInt(Dim)) = Seq(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity)(rnd.nextInt(3))
          v
        case _ => randVec(1.0)
      }
      buf += ((i.toLong, v))
    }
    buf.toSeq
  }

  private def toDF(docs: Seq[(Long, Array[Float])], parts: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = true)
    ))
    spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map { case (id, v) => Row(id, v) }, parts), schema)
  }

  private def centroids(seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed * 131)
    val k   = 4 + rnd.nextInt(5)
    SimilarityOps.canonicalizeCentroids(Array.fill(k) {
      val c = Array.fill(Dim)(rnd.nextDouble() - 0.5)
      c(0) = c(0) + (if (c(0) >= 0) 0.25 else -0.25) // never zero-norm
      c
    })
  }

  private def qidsOf(docs: Seq[(Long, Array[Float])], seed: Long): Seq[Long] = {
    val rnd = new scala.util.Random(seed * 97)
    // include ids that may be NULL/zero-norm (must silently drop out) and
    // one id past the corpus (absent entirely)
    (docs.map(_._1).filter(_ => rnd.nextInt(5) == 0) :+ docs.size.toLong).distinct
  }

  private def topKRows(df: DataFrame): Seq[(Long, Long, Long, Double)] =
    df.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  // --- tests -----------------------------------------------------------------

  test("cosineTopK == brute-force sequential-fold reference on 8 random corpora") {
    for (seed <- 1L to 8L) {
      val docs  = corpus(seed)
      val rnd   = new scala.util.Random(seed * 31)
      val parts = 1 + rnd.nextInt(5)
      val k     = Seq(3, 7, 10)(rnd.nextInt(3))
      val qids  = qidsOf(docs, seed)
      val got = topKRows(SimilarityOps.cosineTopK(toDF(docs, parts), qids, k))
      assert(got == refTopK(docs, qids, k), s"seed $seed k $k qids $qids")
    }
  }

  test("lshBuckets == quantizer-clamp signature reference (NaN/Inf/1e30 components)") {
    for (seed <- 11L to 18L) {
      val docs  = corpus(seed, hostileFloats = true)
      val parts = 1 + new scala.util.Random(seed * 41).nextInt(5)
      val expected = docs.sortBy(_._1).map { case (id, v) => (id, refBucket(v)) }
      val got = SimilarityOps.lshBuckets(toDF(docs, parts)).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got == expected, s"seed $seed n ${docs.size}")
    }
  }

  test("ivfAssignTrained + embeddingOutliers == argmax reference on 6 random corpora") {
    for (seed <- 21L to 26L) {
      val docs  = corpus(seed)
      val cents = centroids(seed)
      val parts = 1 + new scala.util.Random(seed * 43).nextInt(5)
      val df    = toDF(docs, parts)
      val expected = refAssign(docs, cents).map { case (id, cid, s) => (id, cid, round6(s)) }
      val got = SimilarityOps.ivfAssignTrained(df, cents).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got == expected, s"seed $seed k ${cents.length}")

      val kOut = 5
      val expectedOut = expected.sortBy { case (id, _, s) => (s, id) }.take(kOut)
      val gotOut = SimilarityOps.embeddingOutliers(df, cents, kOut).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(gotOut == expectedOut, s"seed $seed outliers")
    }
  }

  test("ivfTopKTrained == probe-cell reference; nprobe ≥ cells degenerates to exact top-k") {
    for (seed <- 31L to 36L) {
      val docs  = corpus(seed)
      val cents = centroids(seed)
      val rnd   = new scala.util.Random(seed * 47)
      val parts = 1 + rnd.nextInt(5)
      val k     = Seq(3, 5, 10)(rnd.nextInt(3))
      val nprobe = 1 + rnd.nextInt(cents.length)
      val qids  = qidsOf(docs, seed)
      val df    = toDF(docs, parts)
      val got = topKRows(SimilarityOps.ivfTopKTrained(df, cents, qids, k, nprobe))
      assert(got == refIvfTopK(docs, cents, qids, k, nprobe), s"seed $seed k $k nprobe $nprobe")
      // all cells probed ⇒ candidate set is the whole base ⇒ exact top-k
      val all = topKRows(SimilarityOps.ivfTopKTrained(df, cents, qids, k, cents.length))
      assert(all == topKRows(SimilarityOps.cosineTopK(df, qids, k)), s"seed $seed full-probe")
    }
  }

  test("annTopK == hamming-radius candidate reference at radius 0..3") {
    for (seed <- 41L to 44L; maxHamming <- 0 to 3) {
      val docs  = corpus(seed)
      val rnd   = new scala.util.Random(seed * 53 + maxHamming)
      val parts = 1 + rnd.nextInt(5)
      val k     = Seq(3, 5, 10)(rnd.nextInt(3))
      val qids  = qidsOf(docs, seed)
      val got = topKRows(SimilarityOps.annTopK(toDF(docs, parts), qids, k, maxHamming))
      assert(got == refAnnTopK(docs, qids, k, maxHamming), s"seed $seed radius $maxHamming")
    }
  }

  test("cosineDupPairs == quadratic reference at loose and tight thresholds") {
    for (seed <- 51L to 56L; threshold <- Seq(0.2, 0.9)) {
      val docs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 59).nextInt(5)
      val base  = refBase(docs)
      val expected = (for {
        i <- base.indices; j <- base.indices
        (ida, va, na) = base(i); (idb, vb, nb) = base(j)
        if ida < idb
        s = dot(va, vb) / (math.sqrt(na) * math.sqrt(nb))
        if s >= threshold
      } yield (ida, idb, round6(s))).sortBy(t => (t._1, t._2))
      val got = SimilarityOps.cosineDupPairs(toDF(docs, parts), threshold).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got == expected, s"seed $seed threshold $threshold")
    }
  }

  test("dimStats == per-dimension reference (zero vectors in, NULL embeddings out)") {
    for (seed <- 61L to 66L) {
      val docs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 61).nextInt(5)
      val cols = docs.collect { case (_, v) if v != null => v.map(_.toDouble) }
      val expected = (0 until Dim).map { d =>
        val xs = cols.map(_(d))
        val norm = xs.map(x => if (x == 0.0) 0.0 else x) // -0.0 folds into 0.0 in agg keys
        (d.toLong, xs.size.toLong, xs.count(_ == 0.0).toLong, norm.distinct.size.toLong,
          xs.min(Ordering.fromLessThan[Double](java.lang.Double.compare(_, _) < 0)),
          xs.max(Ordering.fromLessThan[Double](java.lang.Double.compare(_, _) < 0)))
      }
      val got = SimilarityOps.dimStats(toDF(docs, parts)).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      assert(got == expected, s"seed $seed")
    }
  }
}
