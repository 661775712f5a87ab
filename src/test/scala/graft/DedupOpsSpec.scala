package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.DedupOps

/** Planted-duplicate behavior of the dedup tiers. Cross-engine agreement of
  * the same operators is covered by the DuckDB oracle gate
  * (dedup_exact/minhash_pairs/simhash/jaccard_pairs_documents); these specs
  * prove the operators actually FIND duplicates on known-truth fixtures.
  */
class DedupOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
  private def salad(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
  }

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private val base   = salad(1, 50)
  private val nearDup = base.split(" ").updated(25, "CHANGED").mkString(" ") // 1 of 50 tokens
  private val other  = salad(2, 50)

  test("exactDuplicates groups case/whitespace variants, keeps min doc_id") {
    val df = docs(
      (1L, "Key Agg  Row"),
      (2L, "key agg row"),
      (3L, "different text")
    )
    val rows = DedupOps.exactDuplicates(df).collect()
    assert(rows.length == 2)
    val dupGroup = rows.find(_.getAs[Long]("n_copies") == 2).get
    assert(dupGroup.getAs[Long]("keep_doc_id") == 1L)
  }

  test("minhash LSH finds planted near-dup, suppresses unrelated pair") {
    val df = docs((1L, base), (2L, nearDup), (3L, other))
    val pairs = DedupOps.minhashCandidatePairs(df).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((1L, 2L)), s"expected planted pair, got $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("minhash signature: identical docs have identical signatures") {
    val df = docs((1L, base), (2L, base))
    val sig = DedupOps.minhashSignatures(df).collect().map(r => r.toSeq.drop(1)).distinct
    assert(sig.length == 1)
  }

  test("simhash: identical same, near-dup close, unrelated far (hamming)") {
    val df = docs((1L, base), (2L, base), (3L, nearDup), (4L, other))
    val m = DedupOps.simhash(df).collect().map(r => r.getLong(0) -> r.getAs[Long]("simhash")).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(m(1L) == m(2L))
    assert(hamming(m(1L), m(3L)) <= 8, s"near-dup hamming ${hamming(m(1L), m(3L))}")
    assert(hamming(m(1L), m(4L)) > hamming(m(1L), m(3L)))
  }

  test("simhashPairs: byte-band pigeonhole finds the planted near-dup pair") {
    val df = docs((1L, base), (2L, nearDup), (3L, other))
    val pairs = DedupOps.simhashPairs(df, maxHamming = 8).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming")))
    val planted = pairs.find(p => p._1 == 1L && p._2 == 2L)
    assert(planted.isDefined, s"planted pair missing from $pairs")
    assert(planted.get._3 <= 8)
  }

  test("fp_roll is order-sensitive where set-based hashes are not") {
    import graft.text.TextOps
    val d = docs(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"), // same token SET, different order
      (3L, "alpha beta gamma delta")
    )
    val m = TextOps.fingerprints(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp_roll")).toMap
    assert(m(1L) == m(3L)) // identical stream → identical rolling hash
    assert(m(1L) != m(2L)) // permuted stream → different rolling hash
  }

  // --- native-kernel parity: the compiled TextHashKernel expressions must be
  // bit-identical to the interpreted higher-order formulations they replaced
  // (every declared dedup oracle hash depends on this) — asserted on the real
  // sf0.001 documents table, not a toy fixture

  private lazy val realDocs = Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("kernel parity: simhash equals the interpreted nested-fold formulation") {
    import org.apache.spark.sql.functions._
    val interpreted = realDocs
      .select(col("doc_id"), expr("filter(split(lower(text), ' '), t -> t != '')").as("toks"))
      .where(size(col("toks")) > 0)
      .withColumn(
        "ths",
        expr("transform(toks, t -> CAST(conv(substring(md5(CAST(t AS BINARY)), 1, 8), 16, 10) AS BIGINT))")
      )
      .withColumn(
        "simhash",
        expr(
          """aggregate(sequence(0, 31), 0L, (acc, j) ->
            |  acc + IF(aggregate(ths, 0L,
            |             (a, t) -> a + IF((t DIV CAST(pow(2, j) AS BIGINT)) % 2 = 1, 1L, -1L)) > 0,
            |           CAST(pow(2, j) AS BIGINT), 0L))""".stripMargin
        )
      )
      .select("doc_id", "simhash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = DedupOps.simhash(realDocs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == interpreted)
  }

  test("kernel parity: minhash signatures equal the explode+groupBy formulation") {
    import org.apache.spark.sql.functions._
    val hashed = DedupOps.shingleDF(realDocs)
      .withColumn("x", conv(substring(md5(col("shingle").cast("binary")), 1, 8), 16, 10).cast("long"))
    val mins = DedupOps.hashCoeffs.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("x") + lit(b)) % lit(DedupOps.HashPrime)).as(s"s$i")
    }
    val interpreted = hashed.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val native = DedupOps.minhashSignatures(realDocs)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(native == interpreted)
  }

  test("kernel parity: shingle array equals the sequence+transform formulation") {
    import org.apache.spark.sql.functions._
    val toks = split(lower(col("text")), " ")
    val n    = DedupOps.ShingleSize
    val idxs =
      when(size(toks) >= n, sequence(lit(1), size(toks) - (n - 1)))
        .otherwise(array().cast("array<int>"))
    val shingles = transform(
      idxs,
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))
    )
    val interpreted = realDocs.select(col("doc_id"), explode(shingles).as("shingle"))
      .groupBy("doc_id").agg(sort_array(collect_list("shingle")).as("ss"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val native = DedupOps.shingleDF(realDocs)
      .groupBy("doc_id").agg(sort_array(collect_list("shingle")).as("ss"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native == interpreted)
  }

  test("simhashBandLayout: disjoint cover of all 32 bits, byte layout at h=3") {
    assert(DedupOps.simhashBandLayout(3) == Seq((0, 8), (8, 8), (16, 8), (24, 8)))
    for (h <- 0 until 32) {
      val layout = DedupOps.simhashBandLayout(h)
      assert(layout.size == h + 1)
      val bits = layout.flatMap { case (off, w) => off until (off + w) }
      assert(bits.sorted == (0 until 32), s"h=$h layout $layout")
    }
  }

  test("incremental minhash pairs: previous ∪ incremental == full batch (real corpus split)") {
    import org.apache.spark.sql.functions.col
    // split the real corpus at the DECLARED query's split point
    val split   = SparkEntry.incrementalSplit
    val history = realDocs.where(col("doc_id") < split)
    val fresh   = realDocs.where(col("doc_id") >= split)
    val histSigs = DedupOps.minhashSignatures(history)
    val newSigs  = DedupOps.minhashSignatures(fresh)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val previous    = pairSet(DedupOps.minhashCandidatePairs(history))
    val incremental = pairSet(DedupOps.incrementalMinhashPairs(histSigs, newSigs))
    val full        = pairSet(DedupOps.minhashCandidatePairs(realDocs))
    assert((previous ++ incremental) == full, s"missing=${full -- previous -- incremental} extra=${(previous ++ incremental) -- full}")
    // every incremental pair involves a new doc
    assert(incremental.forall { case (a, b) => a >= split || b >= split })
  }

  test("jaccardPairs: planted pair above threshold with correct J; df-cap is recall-lossy not additive") {
    val df = docs((1L, base), (2L, nearDup), (3L, other))
    val rows = DedupOps.jaccardPairs(df, threshold = 0.5).collect()
    assert(rows.length == 1)
    assert((rows(0).getAs[Long]("doc_a"), rows(0).getAs[Long]("doc_b")) == (1L, 2L))
    val j = rows(0).getAs[Double]("jaccard")
    assert(j > 0.8 && j < 1.0, s"J=$j") // 1-token change in 50 → 3 shingles affected
    // df-capped variant can only lose pairs, never invent them
    val capped = DedupOps.jaccardPairs(df, threshold = 0.5, maxShingleDf = Some(1)).collect()
    assert(capped.isEmpty || capped.length <= rows.length)
  }

  test("jaccardPairsFromPostings over a persisted postings frame ≡ the direct path, both configurations") {
    val df = docs((1L, base), (2L, nearDup), (3L, other))
    val postings = DedupOps.shinglePostings(df).persist()
    try {
      for (cap <- Seq(None, Some(1), Some(2))) {
        val shared = DedupOps.jaccardPairsFromPostings(postings, threshold = 0.5, maxShingleDf = cap).collect().toSeq
        val direct = DedupOps.jaccardPairs(df, threshold = 0.5, maxShingleDf = cap).collect().toSeq
        assert(shared == direct, s"cap=$cap")
      }
    } finally postings.unpersist(blocking = false)
  }

  test("dupShingleStats: planted shared shingles give exact per-doc counts and ratios") {
    val df = docs(
      (1L, "a b c d"), // shingles: "a b c", "b c d" — shares "a b c" with doc 2
      (2L, "x a b c"), // shingles: "x a b", "a b c"
      (3L, "p q r s"), // fully unique shingles
      (4L, "t u")      // sub-shingle-length → absent from the output
    )
    val out = DedupOps.dupShingleStats(DedupOps.shinglePostings(df)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 0L, 0.0)))
    assert(!out.contains(4L))
  }
}
