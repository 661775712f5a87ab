package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analytics.PageRank
import graft.similarity.HybridSearch
import graft.text.SpanDedup

/** Round-11h wave: ExactSubstr span dedup with reconstruction, integer
  * PageRank over the transition graph, RRF hybrid retrieval.
  */
class R11hOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, dir, "documents")
  private def emb  = Tables.load(spark, dir, "embeddings")
  private def ev   = Tables.load(spark, dir, "events")

  // --- spanDedup -------------------------------------------------------------

  test("spanDedup: hand-built duplicated span keeps first occurrence only") {
    val d = Seq(
      (0L, "a b c d e f g h x"),
      (1L, "z a b c d e f g h")
    ).toDF("doc_id", "text")
    val rows = SpanDedup.spanDedup(d, k = 8).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(0L).getLong(1) == 9L && byId(0L).getLong(2) == 9L)
    assert(byId(0L).getString(3) == "a b c d e f g h x")
    // doc1: positions 1..8 (the duplicated span's non-first occurrence) cut
    assert(byId(1L).getLong(1) == 9L && byId(1L).getLong(2) == 1L)
    assert(byId(1L).getString(3) == "z")
  }

  test("spanDedup: corpus invariants — kept counts match rebuilt text; clean docs round-trip") {
    val rows = SpanDedup.spanDedup(docs).collect()
    assert(rows.nonEmpty)
    val orig = docs.select(col("doc_id"), lower(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (id, nTok, nKept, kept) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      assert(nKept <= nTok)
      val keptToks = if (kept.isEmpty) 0 else kept.split(" ").length
      assert(keptToks == nKept, s"doc $id: n_kept=$nKept but text has $keptToks tokens")
      if (nKept == nTok) assert(kept == orig(id), s"doc $id untouched but text differs")
    }
    // the synthetic corpus DOES contain duplicated 8-token spans — the op bites
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)), "expected at least one cut")
  }

  // --- pageRank --------------------------------------------------------------

  test("pageRank: positive ranks, mass bounded by SCALE, deterministic") {
    val r1 = PageRank.pageRank(spark, ev).collect()
    assert(r1.nonEmpty)
    assert(r1.forall(_.getLong(1) > 0))
    // total mass ≤ SCALE (floor losses + dangling drain only ever shrink it)
    val total = r1.map(_.getLong(1)).sum
    assert(total <= 1000000000000L && total > 500000000000L)
    // heaviest-first ordering with event_type tiebreak
    val ranks = r1.map(_.getLong(1)).toSeq
    assert(ranks == ranks.sorted(Ordering[Long].reverse))
    val r2 = PageRank.pageRank(spark, ev).collect()
    assert(r1.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      r2.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("pageRank: teleport floor — a node with no in-edges still holds mass") {
    // hand graph: a -> b only; c isolated. c ends at pure teleport share.
    val ts = (i: Int) => new java.sql.Timestamp(1700000000000L + i * 1000L)
    val d = Seq(
      (1L, 1L, "a", ts(0)), (2L, 1L, "b", ts(1)), (3L, 2L, "c", ts(2))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val rows = PageRank.pageRank(spark, d, iters = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val scale = 1000000000000L
    val teleport = (15L * scale) / (100L * 3)
    assert(rows("c") == teleport)
    assert(rows("b") > rows("a")) // b receives a's routed mass
    assert(rows("a") == teleport) // a has no in-edges
  }

  test("pageRank bounded and distributed variants agree on the same graph (r10)") {
    // the type graph through the bounded (driver-local loop) entry point…
    val bounded = PageRank.pageRank(spark, ev, iters = 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // …and through the distributed loop fed the identical edge/node relations
    val edges = graft.analytics.EventOps.transitions(ev)
      .select(col("prev_type").as("src"), col("next_type").as("dst"), col("n").as("w"))
    val nodes = ev.select(col("event_type").as("node")).distinct()
    val dist = PageRank.pageRankGraph(spark, edges, nodes, iters = 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(bounded == dist, "exact integer arithmetic must make the variants bit-identical")
  }

  test("pageRankUsers: per-user chains hold their own mass; bounded cap enforced (r10)") {
    val rows = PageRank.pageRankUsers(spark, ev).collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(1) > 0))
    assert(rows.forall(_.getString(0).matches("u\\d+:.+")))
    // per-user graphs are disjoint: a single user's subchain ranked alone
    // equals its slice of... (teleport differs with N, so just sanity-order)
    val ranks = rows.map(_.getLong(1)).toSeq
    assert(ranks == ranks.sorted(Ordering[Long].reverse))
    // the bounded entry point refuses a corpus-scale vertex set loudly
    val big = ev.limit(1).select(
      explode(sequence(lit(1L), lit(PageRank.MaxBoundedVertices + 1))).as("event_id"))
      .select(col("event_id"), col("event_id").as("user_id"),
        concat(lit("t"), col("event_id")).as("event_type"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("ts"))
    val e = intercept[IllegalArgumentException](PageRank.pageRank(spark, big))
    assert(e.getMessage.contains("pageRankGraph"))
  }

  test("pageRankGraph cache evicts the single OLDEST entry at the bound — no full flush (r11)") {
    PageRank.clearCache()
    val oldBound = PageRank.GraphCacheMax
    PageRank.GraphCacheMax = 3 // spec-only shrink; see the var's doc
    try {
      def graph(tag: Int) = (
        Seq((s"a$tag", s"b$tag", 1L)).toDF("src", "dst", "w"),
        Seq(s"a$tag", s"b$tag").toDF("node")
      )
      // mirrors pageRankGraph's key: canonicalized plan OBJECTS, whose
      // structural equality sees LocalRelation data (the string doesn't)
      def key(e: org.apache.spark.sql.DataFrame, n: org.apache.spark.sql.DataFrame): Any =
        (spark.sparkContext.applicationId,
          e.queryExecution.analyzed.canonicalized,
          n.queryExecution.analyzed.canonicalized)
      val gs = (1 to 4).map(graph)
      gs.take(3).foreach { case (e, n) => PageRank.pageRankGraph(spark, e, n, iters = 1).count() }
      assert(PageRank.cacheKeys.size == 3)
      val oldest = key(gs(0)._1, gs(0)._2)
      assert(PageRank.cacheKeys.contains(oldest))
      // 4th distinct graph crosses the bound: exactly one eviction, oldest out
      PageRank.pageRankGraph(spark, gs(3)._1, gs(3)._2, iters = 1).count()
      val keys = PageRank.cacheKeys
      assert(keys.size == 3, s"bound must hold exactly (got ${keys.size})")
      assert(!keys.contains(oldest), "the oldest entry must be the one evicted")
      assert(keys.contains(key(gs(1)._1, gs(1)._2)) && keys.contains(key(gs(2)._1, gs(2)._2)),
        "younger entries must survive — a full flush here is the r10 cliff")
      // a cached graph re-requested is a hit, not a re-insert: size unchanged
      PageRank.pageRankGraph(spark, gs(2)._1, gs(2)._2, iters = 1).count()
      assert(PageRank.cacheKeys == keys)
    } finally {
      PageRank.GraphCacheMax = oldBound
      PageRank.clearCache()
    }
  }

  test("pageRankGraph cache is LRU, not FIFO: a hit refreshes, so churn evicts the least-recently-USED (r11)") {
    PageRank.clearCache()
    val oldBound = PageRank.GraphCacheMax
    PageRank.GraphCacheMax = 3
    try {
      def graph(tag: Int) = (
        Seq((s"a$tag", s"b$tag", 1L)).toDF("src", "dst", "w"),
        Seq(s"a$tag", s"b$tag").toDF("node")
      )
      def key(e: org.apache.spark.sql.DataFrame, n: org.apache.spark.sql.DataFrame): Any =
        (spark.sparkContext.applicationId,
          e.queryExecution.analyzed.canonicalized,
          n.queryExecution.analyzed.canonicalized)
      val gs = (1 to 4).map(graph)
      gs.take(3).foreach { case (e, n) => PageRank.pageRankGraph(spark, e, n, iters = 1).count() }
      // re-hit the insertion-OLDEST graph: under FIFO it would still be evicted
      // next; under LRU the hit refreshes it and graph 2 becomes the victim
      PageRank.pageRankGraph(spark, gs(0)._1, gs(0)._2, iters = 1).count()
      PageRank.pageRankGraph(spark, gs(3)._1, gs(3)._2, iters = 1).count()
      val keys = PageRank.cacheKeys
      assert(keys.size == 3)
      assert(keys.contains(key(gs(0)._1, gs(0)._2)),
        "the hot (re-hit) graph must survive churn — FIFO would evict it and re-persist the corpus-sized relation")
      assert(!keys.contains(key(gs(1)._1, gs(1)._2)), "the true LRU entry is the victim")
      assert(keys.contains(key(gs(2)._1, gs(2)._2)) && keys.contains(key(gs(3)._1, gs(3)._2)))
    } finally {
      PageRank.GraphCacheMax = oldBound
      PageRank.clearCache()
    }
  }

  test("pageRankGraph handles a vertex set the bounded variant refuses (r10)") {
    // a 3x-over-cap chain graph: node i -> i+1, all weight 1
    val n = (PageRank.MaxBoundedVertices * 3).toInt
    val nodes = spark.range(n.toLong).select(concat(lit("v"), col("id")).as("node"))
    val edges = spark.range((n - 1).toLong).select(
      concat(lit("v"), col("id")).as("src"),
      concat(lit("v"), col("id") + 1).as("dst"),
      lit(1L).as("w"))
    val ranks = PageRank.pageRankGraph(spark, edges, nodes, iters = 2)
    assert(ranks.count() == n.toLong)
    // chain head gets pure teleport; every rank positive; deterministic rerun
    val scale = 1000000000000L
    val teleport = (15L * scale) / (100L * n)
    val byNode = ranks.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byNode("v0") == teleport)
    assert(byNode.values.forall(_ > 0))
    PageRank.clearCache() // release the persisted graph; a fresh call rebuilds
    val again = PageRank.pageRankGraph(spark, edges, nodes, iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == byNode)
  }

  // --- rrfHybrid -------------------------------------------------------------

  test("rrfHybrid: fusion terms match the integer formula; ordering holds") {
    val rows = HybridSearch.rrfHybrid(docs, emb, SparkEntry.bm25Query).collect()
    assert(rows.length >= 20 && rows.length <= 40)
    rows.foreach { r =>
      val (b, a, s) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val expect = (if (b > 0) 1000000000L / (60 + b) else 0L) +
        (if (a > 0) 1000000000L / (60 + a) else 0L)
      assert(s == expect, s"doc ${r.getLong(0)}: rrf $s != $expect")
      assert(b > 0 || a > 0)
    }
    val scores = rows.map(_.getLong(3)).toSeq
    assert(scores == scores.sorted(Ordering[Long].reverse))
    // the top fused doc must sit near the head of at least one list
    val headRanks = Seq(rows.head.getLong(1), rows.head.getLong(2)).filter(_ > 0)
    assert(headRanks.nonEmpty && headRanks.min <= 3L)
  }
}
