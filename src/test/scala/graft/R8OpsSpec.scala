package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.curation.Curation
import graft.dedup.{DedupClusters, DedupOps}
import graft.sampling.Sampling
import graft.similarity.SimilarityOps
import graft.vault.Scd2

/** Round-8 operator wave: quality-argmax survivors, mixture planning,
  * edit-distance pair verification, IVF recall evaluation, and the DV2.0
  * point-in-time table. Cross-engine agreement of the declared forms is the
  * oracle gate's job; these specs prove the operator properties and the
  * branch cases the no-surprises sf corpus can't reach.
  */
class R8OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
  private lazy val emb  = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  // --- bestSurvivors --------------------------------------------------------

  test("bestSurvivors: one survivor per cluster, survivor is a member of its cluster") {
    val clusters = DedupClusters.dedupClusters(docs)
    val out      = Curation.bestSurvivors(docs, clusters).collect()
    val nClusters = clusters.select("cluster_id").distinct().count()
    assert(out.length == nClusters)
    val members = clusters.collect().map(r => (r.getLong(1), r.getLong(0))).groupMap(_._1)(_._2)
    out.foreach { r =>
      val (cid, did) = (r.getLong(0), r.getLong(1))
      assert(members(cid).contains(did), s"survivor $did not in cluster $cid")
    }
  }

  test("bestSurvivors: quality class beats token count beats doc_id, in that order") {
    // 'the' is an en marker, so 21 repeats + zero punct = good; shorter texts = fair
    val good  = Seq.fill(21)("the").mkString(" ")
    val fairA = Seq.fill(10)("xx").mkString(" ")
    val fairB = Seq.fill(12)("xx").mkString(" ")
    val d = Seq(
      (1L, fairA, "en", "s", 30L),
      (2L, good, "en", "s", 80L),
      (3L, fairB, "en", "s", 36L),
      (4L, fairA, "en", "s", 30L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    // cluster 1 holds docs 1,2,3 (good doc 2 must win over longer fair doc 3);
    // cluster 4 holds doc 4 alone
    val cl = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L)).toDF("doc_id", "cluster_id")
    val out = Curation.bestSurvivors(d, cl).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 2L, 4L -> 4L))
    // with the good doc removed, the LONGER fair doc wins; equal-length ties
    // fall to the lower doc_id
    val cl2 = Seq((1L, 1L), (3L, 1L), (4L, 1L)).toDF("doc_id", "cluster_id")
    val out2 = Curation.bestSurvivors(d, cl2).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out2 == Map(1L -> 3L))
    val cl3 = Seq((1L, 1L), (4L, 1L)).toDF("doc_id", "cluster_id")
    val out3 = Curation.bestSurvivors(d, cl3).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out3 == Map(1L -> 1L))
  }

  test("bestSurvivors: argmax is an aggregate, not a window (map-side combinable)") {
    val clusters = DedupClusters.dedupClusters(docs)
    val plan = Curation.bestSurvivors(docs, clusters).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "survivor argmax must not plan a window")
  }

  // --- mixPlan --------------------------------------------------------------

  test("mixPlan: planned ≤ target and ≤ available; rate = planned/available ∈ [0,1]") {
    val rows = Sampling.mixPlan(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (have, target, planned, rate) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(planned == math.min(target, have))
      assert(rate >= 0.0 && rate <= 1.0)
      assert(rate == planned.toDouble / have)
    }
  }

  test("mixPlan: integer-fraction targets are exact; unlisted language gets 0") {
    // 4 langs × 10 tokens each; budget = 40/2 = 20 → en target 10, zh/es 4, fr 2
    val txt = Seq.fill(10)("w").mkString(" ")
    val d = Seq(
      (1L, txt, "en", "s", 19L), (2L, txt, "zh", "s", 19L),
      (3L, txt, "es", "s", 19L), (4L, txt, "de", "s", 19L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Sampling.mixPlan(d).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out("en") == ((10L, 10L)))
    assert(out("zh") == ((4L, 4L)))
    assert(out("es") == ((4L, 4L)))
    assert(out("de") == ((0L, 0L))) // not in MixShares → zero plan
  }

  // --- editDistancePairs ----------------------------------------------------

  test("editDistancePairs: distances are bounded by the prefix and zero for exact dups") {
    val pairs = DedupOps.editDistancePairs(docs).collect()
    assert(pairs.nonEmpty, "sf0.001 has LSH candidate pairs")
    pairs.foreach(r => assert(r.getLong(2) >= 0L && r.getLong(2) <= 200L))
    // identical texts always band together (equal signatures) and must
    // verify at distance 0; the one-token edit costs its token length
    val t  = (1 to 30).map(i => s"tok$i").mkString(" ")
    val t2 = t.replace("tok7", "differ7")
    val d = Seq((1L, t, "en", "s", 0L), (2L, t, "en", "s", 0L), (3L, t2, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val fx = DedupOps.editDistancePairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fx((1L, 2L)) == 0L)
    // the near-dup pair may or may not band; if it does, the distance is the
    // single-token substitution cost ("tok" -> "differ": no shared chars,
    // 3 substitutions + 3 insertions = 6 edits)
    Seq((1L, 3L), (2L, 3L)).foreach(p => fx.get(p).foreach(dist => assert(dist == 6L)))
  }

  // --- ivfRecall ------------------------------------------------------------

  test("ivfRecall: hits ≤ k, recall ∈ [0,1]; probing every cell gives recall 1") {
    val cents = SimilarityOps.canonicalizeCentroids(
      graft.similarity.KMeans.trainCentroids(emb, k = 4, iters = 2))
    val partial = SimilarityOps.ivfRecall(emb, cents, nprobe = 2).collect()
    partial.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // nprobe = k(cells): the candidate set is the whole corpus → exact
    val full = SimilarityOps.ivfRecall(emb, cents, nprobe = 4).collect()
    full.foreach(r => assert(r.getDouble(3) == 1.0, s"qid ${r.getLong(0)} recall ${r.getDouble(3)}"))
  }

  // --- datasheet ------------------------------------------------------------

  test("datasheet: fixed metric set, counts exact, ratios in [0,1], value columns disjoint") {
    val rows = graft.report.Datasheet.datasheet(docs).collect()
    assert(rows.map(_.getString(0)).toSet == Set(
      "n_docs", "n_tokens", "n_langs", "n_sources",
      "exact_dup_groups", "minhash_candidate_pairs",
      "pct_good_quality", "pred_lang_coverage"))
    val byMetric = rows.map(r => r.getString(0) -> r).toMap
    assert(byMetric("n_docs").getLong(1) == docs.count())
    rows.foreach { r =>
      // exactly one of (value_long, value_ratio) is set
      assert(r.isNullAt(1) != r.isNullAt(2))
      if (!r.isNullAt(2)) assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
  }

  // --- pitTable -------------------------------------------------------------

  test("pitTable: each snapshot picks exactly the episode in effect, unborn entities excluded") {
    val ts = java.sql.Timestamp.valueOf(_: String)
    val orders = Seq(
      // customer 1: LOW until 1997, then HIGH (open episode)
      (101L, 1L, "LOW", ts("1995-03-01 00:00:00")),
      (102L, 1L, "LOW", ts("1996-02-01 00:00:00")),
      (103L, 1L, "HIGH", ts("1997-01-15 00:00:00")),
      // customer 2: born 1999 — invisible to earlier snapshots
      (201L, 2L, "MED", ts("1999-06-01 00:00:00"))
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate")
    val eps = Scd2.episodes(orders, "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
    val out = Scd2
      .pitTable(eps, "o_custkey", Seq("1995-01-01", "1996-07-01", "1998-07-01", "2000-07-01"))
      .collect()
      .map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1)) -> r.getString(3))
      .toMap
    assert(out == Map(
      ("1996-07-01", 1L) -> "LOW",  // mid first episode
      ("1998-07-01", 1L) -> "HIGH", // open episode matches
      ("2000-07-01", 1L) -> "HIGH",
      ("2000-07-01", 2L) -> "MED"   // customer 2 only after birth
    )) // nothing at 1995-01-01: no entity born yet
  }
}
