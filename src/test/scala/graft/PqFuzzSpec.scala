package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.{Pq, SimilarityOps}

/** Differential fuzz of the PQ tier against in-JVM references. Training is
  * pinned by PqSpec (shape/determinism) and the oracle gate; HERE the
  * encode/search machinery runs against RANDOM canonicalized codebooks —
  * decoupling the fuzz from Lloyd's — and random corpora with planted
  * degeneracies: duplicate vectors (tie codes), zero vectors (valid PQ
  * input — no norm division in ADC), subvectors equidistant to two
  * codebook entries (exact tie → lowest code), 1e3/1e-6 magnitudes. The
  * references replay the declared arithmetic: ordered-fold squared L2 in
  * index order, ADC terms summed in subspace order, Spark HALF_UP rounding,
  * (rounded adc, vec_id) shortlist cut, (raw sim DESC, vec_id) final rank.
  * NULL embeddings stay out: PQ's declared domain is the non-null embedding
  * table (training `require`s one), and `subsDF` would ride null subvectors
  * into the argmin otherwise.
  */
class PqFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  private val Dim   = SimilarityOps.Dim

  // --- reference arithmetic --------------------------------------------------

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Ordered fold of (x-y)² in index order — the d2 / d2Sql sequence. */
  private def d2(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def sub(v: Array[Double], m: Int, sd: Int): Array[Double] =
    v.slice(m * sd, m * sd + sd)

  /** (vec_id, m) → (code, dd): argmin squared L2, lowest-code tie-break. */
  private def refCodes(
      docs: Seq[(Long, Array[Float])], cbs: Array[Array[Array[Double]]]
  ): Map[(Long, Long), (Long, Double)] = {
    val sd = cbs.head.head.length
    (for {
      (id, vf) <- docs
      v = vf.map(_.toDouble)
      m <- cbs.indices
    } yield {
      val s = sub(v, m, sd)
      val (code, dd) = cbs(m).zipWithIndex
        .map { case (c, j) => (j.toLong, d2(s, c)) }
        .minBy { case (j, dd) => (dd, j) }
      (id, m.toLong) -> (code, dd)
    }).toMap
  }

  /** ADC distance: per-subspace lookup terms summed in m-order. */
  private def refAdc(
      qv: Array[Double], codes: Seq[Long], cbs: Array[Array[Array[Double]]]
  ): Double = {
    val sd = cbs.head.head.length
    var acc = 0.0
    for (m <- cbs.indices) acc += d2(sub(qv, m, sd), cbs(m)(codes(m).toInt))
    round6(math.sqrt(acc))
  }

  private def refAdcTopK(
      docs: Seq[(Long, Array[Float])], cbs: Array[Array[Array[Double]]],
      qids: Seq[Long], k: Int
  ): Seq[(Long, Long, Double)] = {
    val codes = refCodes(docs, cbs)
    def codeVec(id: Long): Seq[Long] = cbs.indices.map(m => codes((id, m.toLong))._1)
    docs.filter(d => qids.contains(d._1)).sortBy(_._1).flatMap { case (qid, qvf) =>
      val qv = qvf.map(_.toDouble)
      docs.map { case (id, _) => (qid, id, refAdc(qv, codeVec(id), cbs)) }
        .sortBy { case (_, id, a) => (a, id) }
        .take(k)
    }
  }

  // --- corpora ---------------------------------------------------------------

  private def corpus(seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    def randVec(scale: Double): Array[Float] =
      Array.fill(Dim)(((rnd.nextDouble() - 0.5) * scale).toFloat)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
    val n = 16 + rnd.nextInt(24)
    for (i <- 0 until n) {
      val v: Array[Float] = rnd.nextInt(10) match {
        case 0 => Array.fill(Dim)(0f)
        case 1 if buf.nonEmpty => buf(rnd.nextInt(buf.size))._2.clone() // dup → tie codes
        case 2 => randVec(1e3)
        case 3 => randVec(1e-6)
        case _ => randVec(1.0)
      }
      buf += ((i.toLong, v))
    }
    buf.toSeq
  }

  /** Random canonicalized codebooks — including a duplicated entry per
    * subspace, so some subvector is exactly equidistant to two codes and
    * the lowest-code tie-break is exercised on EVERY corpus.
    */
  private def codebooks(seed: Long, m: Int, k: Int): Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed * 211)
    val sd  = Dim / m
    Array.fill(m) {
      val cb = Array.fill(k)(Array.fill(sd)(rnd.nextDouble() - 0.5))
      cb(k - 1) = cb(rnd.nextInt(k - 1)).clone() // exact duplicate entry
      SimilarityOps.canonicalizeCentroids(cb)
    }
  }

  private def centroids(seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed * 131)
    val k   = 4 + rnd.nextInt(4)
    SimilarityOps.canonicalizeCentroids(Array.fill(k) {
      val c = Array.fill(Dim)(rnd.nextDouble() - 0.5)
      c(0) = c(0) + (if (c(0) >= 0) 0.25 else -0.25)
      c
    })
  }

  private def toDF(docs: Seq[(Long, Array[Float])], parts: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false)
    ))
    spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map { case (id, v) => Row(id, v) }, parts), schema)
  }

  // --- tests -----------------------------------------------------------------

  test("codesDF == per-subspace L2 argmin reference (random M/K, duplicate codebook entries)") {
    for (seed <- 1L to 6L) {
      val docs = corpus(seed)
      val rnd  = new scala.util.Random(seed * 31)
      val m    = Seq(2, 4, 8)(rnd.nextInt(3))
      val kcb  = Seq(4, 8, 16)(rnd.nextInt(3))
      val cbs  = codebooks(seed, m, kcb)
      val expected = refCodes(docs, cbs).toSeq
        .map { case ((id, mi), (code, dd)) => (id, mi, code, round6(math.sqrt(dd))) }
        .sortBy(t => (t._1, t._2))
      val got = Pq.codesDF(toDF(docs, 1 + rnd.nextInt(5)), cbs).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(got == expected, s"seed $seed M $m K $kcb")
    }
  }

  test("adcTopK == lookup-table m-ordered-sum reference on 6 random corpora") {
    for (seed <- 11L to 16L) {
      val docs = corpus(seed)
      val rnd  = new scala.util.Random(seed * 37)
      val m    = Seq(2, 4)(rnd.nextInt(2))
      val cbs  = codebooks(seed, m, 8)
      val k    = Seq(3, 5, 10)(rnd.nextInt(3))
      val qids = (docs.map(_._1).filter(_ => rnd.nextInt(5) == 0) :+ docs.size.toLong).distinct
      val got = Pq.adcTopK(toDF(docs, 1 + rnd.nextInt(5)), cbs, qids, k).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got == refAdcTopK(docs, cbs, qids, k), s"seed $seed M $m k $k")
    }
  }

  test("ivfPqTopK == composed cell→ADC→rerank reference on 6 random corpora") {
    for (seed <- 21L to 26L) {
      val docs  = corpus(seed)
      val rnd   = new scala.util.Random(seed * 41)
      val cents = centroids(seed)
      val cbs   = codebooks(seed, 4, 8)
      val k     = Seq(3, 5)(rnd.nextInt(2))
      val nprobe = 1 + rnd.nextInt(cents.length)
      val rerank = Seq(4, 8, 1000)(rnd.nextInt(3))
      val qids  = (docs.map(_._1).filter(_ => rnd.nextInt(4) == 0) :+ docs.size.toLong).distinct
      val df    = toDF(docs, 1 + rnd.nextInt(5))

      // reference: cells/probes on the zero-norm-excluded base
      val base = docs.map { case (id, vf) => (id, vf.map(_.toDouble)) }
        .map { case (id, v) => (id, v, dot(v, v)) }.filter(_._3 > 0)
      val cn2 = cents.map(c => dot(c, c))
      def centSims(v: Array[Double], n2: Double): Seq[(Long, Double)] =
        cents.indices.map(i => (i.toLong, dot(v, cents(i)) / (math.sqrt(n2) * math.sqrt(cn2(i)))))
      val cell = base.map { case (id, v, n2) => id -> centSims(v, n2).minBy(t => (-t._2, t._1))._1 }.toMap
      val codes = refCodes(docs, cbs)
      def codeVec(id: Long): Seq[Long] = cbs.indices.map(mi => codes((id, mi.toLong))._1)
      val expected = base.filter(t => qids.contains(t._1)).sortBy(_._1).flatMap { case (qid, qv, qn2) =>
        val probeCells = centSims(qv, qn2).sortBy(t => (-t._2, t._1)).take(nprobe).map(_._1).toSet
        val shortlist = base
          .filter { case (id, _, _) => probeCells(cell(id)) }
          .map { case (id, _, _) => (id, refAdc(qv, codeVec(id), cbs)) }
          .sortBy { case (id, a) => (a, id) }
          .take(rerank)
        shortlist
          .map { case (id, adcR) =>
            val (_, v, n2) = base.find(_._1 == id).get
            (id, dot(v, qv) / (math.sqrt(qn2) * math.sqrt(n2)), adcR)
          }
          .sortBy { case (id, s, _) => (-s, id) }
          .take(k)
          .zipWithIndex
          .map { case ((id, s, adcR), r) => (qid, (r + 1).toLong, id, round6(s), adcR) }
      }
      val got = Pq.ivfPqTopK(df, cents, cbs, qids, k, nprobe, rerank).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      assert(got == expected, s"seed $seed nprobe $nprobe rerank $rerank k $k")

      // full probes + unbounded rerank degenerate to exact cosine top-k
      if (rerank == 1000 && nprobe == cents.length) {
        val exact = SimilarityOps.cosineTopK(df, qids, k).collect().toSeq
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        assert(got.map(t => (t._1, t._2, t._3, t._4)) == exact, s"seed $seed degenerate")
      }
    }
  }
}
