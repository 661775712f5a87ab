package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.dedup.DedupClusters
import graft.sampling.Sampling
import graft.streaming.StreamingDedup

/** Round-3 operator families: deterministic hash sampling, connected-
  * components dedup clustering, and streaming first-seen dedup. Cross-engine
  * agreement of the declared forms is covered by the oracle gate
  * (sample_documents / stratified_sample_documents /
  * dedup_clusters_documents); these specs prove the operator PROPERTIES the
  * oracles can't express.
  */
class SamplingClustersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")

  // --- sampling -------------------------------------------------------------

  test("sampleByHash: deterministic, near-target rate, subset-stable under fraction growth") {
    val s10a = Sampling.sampleByHash(docs, "doc_id", 0.10).select("doc_id").collect().map(_.getLong(0)).toSet
    val s10b = Sampling.sampleByHash(docs, "doc_id", 0.10).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10a == s10b) // reproducible
    val n = docs.count()
    assert(math.abs(s10a.size - 0.10 * n) < 0.06 * n, s"rate ${s10a.size.toDouble / n}")
    // monotone: the 10% sample is contained in the 30% sample
    val s30 = Sampling.sampleByHash(docs, "doc_id", 0.30).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(s10a.subsetOf(s30))
  }

  test("sampleByHash: different salts gate independently (train/eval splits)") {
    val train = Sampling.sampleByHash(docs, "doc_id", 0.5, salt = "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val eval_ = Sampling.sampleByHash(docs, "doc_id", 0.5, salt = "eval")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(train != eval_) // not the same gate
    // overlap ≈ 25% of corpus under independence; just require both bounds loose
    val overlap = (train & eval_).size.toDouble / docs.count()
    assert(overlap > 0.1 && overlap < 0.4, s"overlap $overlap")
  }

  test("stratifiedSampleByHash: per-stratum rates honored, unknown strata use default") {
    val fr = Map("en" -> 1.0, "de" -> 0.0)
    val out = Sampling.stratifiedSampleByHash(docs, "doc_id", "lang", fr, defaultFraction = 0.2)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("en") == full("en"))      // keep-all stratum
    assert(!out.contains("de"))          // drop-all stratum
    for ((lang, kept) <- out if lang != "en") {
      val total = full(lang).toDouble
      assert(math.abs(kept - 0.2 * total) < 0.25 * total + 3, s"$lang kept $kept of $total")
    }
  }

  // --- connected components -------------------------------------------------

  test("connectedComponents: chains, singletons, and merged components get min labels") {
    val nodes = (1L to 9L).toDF("id")
    // component {1,2,3} as a chain; {5,6} as a pair; 4,7,8,9 singletons
    val edges = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val labels = DedupClusters.connectedComponents(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L, 9L -> 9L
    ))
  }

  test("connectedComponents: a long chain converges to one label (diameter > 2)") {
    val n     = 12L
    val nodes = (1L to n).toDF("id")
    val edges = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val labels = DedupClusters.connectedComponents(nodes, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.values.toSet == Set(1L))
  }

  test("star contraction equals min-label propagation on random graphs and chains") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 5) {
      val n     = 30L
      val nodes = (1L to n).toDF("id")
      val edges = Seq.fill(25)((rnd.nextLong(n) + 1, rnd.nextLong(n) + 1))
        .filter { case (a, b) => a != b }
        .toDF("src", "dst")
      val simple = DedupClusters.connectedComponents(nodes, edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val star = DedupClusters.connectedComponentsStar(nodes, edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(star == simple, s"trial $trial: star=$star simple=$simple")
    }
    // the adversarial shape star contraction exists for: a long chain
    val n     = 40L
    val nodes = (1L to n).toDF("id")
    val chain = (1L until n).map(i => (i, i + 1)).toDF("src", "dst")
    val star = DedupClusters.connectedComponentsStar(nodes, chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star.values.toSet == Set(1L))
  }

  test("dedupClusters: planted near-dups collapse to one cluster, survivors = min ids") {
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    def salad(seed: Int, m: Int): String = {
      val rnd = new scala.util.Random(seed)
      Seq.fill(m)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val base = salad(1, 50)
    val near1 = base.split(" ").updated(25, "CHANGED").mkString(" ")
    val near2 = base.split(" ").updated(10, "ALSO").mkString(" ")
    val other = salad(2, 50)
    val df = Seq(
      (1L, base), (2L, near1), (3L, near2), (4L, other)
    ).map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val clusters = DedupClusters.dedupClusters(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 2~1 and 3~1 pair via LSH; transitively {1,2,3} is ONE cluster even if
    // the 2~3 pair was never emitted
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L)
    assert(clusters(4L) == 4L)
  }

  // --- streaming first-seen dedup -------------------------------------------

  test("streaming firstSeen: emits first doc per fingerprint across micro-batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val name = "graft_firstseen_test"
    val q = StreamingDedup.firstSeen(stream)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData((1L, "Hello  World"), (2L, "hello world"), (3L, "unrelated"))
      q.processAllAvailable()
      val b1 = spark.table(name).as[StreamingDedup.FirstSeen].collect()
      // 1 and 2 share a normalized fingerprint → min doc_id 1 wins; 3 emits
      assert(b1.map(_.docId).toSet == Set(1L, 3L))

      // a later batch re-sends the seen fingerprint and adds a new one
      input.addData((4L, "HELLO world"), (5L, "fresh text"))
      q.processAllAvailable()
      val b2 = spark.table(name).as[StreamingDedup.FirstSeen].collect()
      assert(b2.map(_.docId).toSet == Set(1L, 3L, 5L)) // 4 suppressed by state
    } finally {
      q.stop()
      spark.sql(s"DROP VIEW IF EXISTS $name")
    }
  }

  test("streaming firstSeen agrees with the batch exactDuplicates survivors") {
    implicit val sq = spark.sqlContext
    val rows = Seq(
      (10L, "a b c"), (11L, "A  b C"), (12L, "x y"), (13L, "x  Y"), (14L, "solo")
    )
    val input = MemoryStream[(Long, String)]
    val name = "graft_firstseen_eq"
    val q = StreamingDedup.firstSeen(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table(name).as[StreamingDedup.FirstSeen].collect().map(_.docId).toSet
      val batchDf = rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val batch = graft.dedup.DedupOps.exactDuplicates(batchDf).collect()
        .map(_.getAs[Long]("keep_doc_id")).toSet
      assert(streamed == batch)
    } finally {
      q.stop()
      spark.sql(s"DROP VIEW IF EXISTS graft_firstseen_eq")
    }
  }

  test("holdout and saltOverlap: relational set ops agree with the gate-set algebra") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val train = ids(Sampling.sampleByHash(docs, "doc_id", 0.25))
    val bench = ids(Sampling.sampleByHash(docs, "doc_id", 0.05, salt = "bench"))
    assert(ids(Sampling.holdout(docs, "doc_id", 0.25, 0.05)) == (train -- bench))
    val a = ids(Sampling.sampleByHash(docs, "doc_id", 0.5, salt = "train"))
    val b = ids(Sampling.sampleByHash(docs, "doc_id", 0.5, salt = "eval"))
    assert(ids(Sampling.saltOverlap(docs, "doc_id", 0.5)) == (a & b))
  }

  test("quotaByHash: at most cap per stratum, deterministic, monotone under cap growth") {
    val out = Sampling.quotaByHash(docs, "doc_id", "source", cap = 3)
    val kept = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, total) <- full)
      assert(kept(src) == math.min(3L, total), s"$src kept ${kept(src)} of $total")
    // reproducible
    val a = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.quotaByHash(docs, "doc_id", "source", cap = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // raising the quota never evicts an already-kept row (hash order is
    // stable — a growing corpus budget only ADDS rows per stratum)
    val c5 = Sampling.quotaByHash(docs, "doc_id", "source", cap = 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(c5))
  }
}
