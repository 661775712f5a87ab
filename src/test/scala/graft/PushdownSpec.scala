package graft

import org.scalatest.funsuite.AnyFunSuite

/** Filter-pushdown pins for the predicates that carry real selectivity at
  * scale — the ones whose loss would turn a pruned scan into a full-corpus
  * read. Generic `IsNotNull` pushdowns are pervasive and not pinned
  * individually; what IS pinned:
  *
  *   - the ANN family's literal query-id set must reach the embeddings scan
  *     as an `In` filter (the query side reads 3 rows from storage, not the
  *     corpus),
  *   - range/equality predicates that define a query's semantics
  *     (benford's positive-price gate, the incremental dedup split point,
  *     RRF's single-query equality),
  *   - the timed-event doctrine: every declared events query that filters
  *     NULL timestamps does it AT THE SCAN (`IsNotNull(ts)` pushed), so a
  *     100 TB events table skips row groups with null-heavy ts columns via
  *     parquet statistics.
  */
class PushdownSpec extends AnyFunSuite {

  private def plan(name: String): String = SurfacePlans.plans(name)

  test("ANN query-side literal id set is pushed into the embeddings scan") {
    for (q <- Seq("ann_embeddings", "knn_embeddings", "ivf_topk_embeddings",
                  "ivf_recall_embeddings", "ivfpq_topk_embeddings", "pq_topk_embeddings"))
      assert(plan(q).contains("PushedFilters: [In(vec_id, [0,1,2]"),
        s"$q: query-id In-filter not pushed to the embeddings scan")
  }

  test("semantics-defining predicates reach their scans") {
    assert(plan("benford_lineitem").contains("GreaterThan(l_extendedprice,0.0)"),
      "benford's positive-price gate not pushed")
    assert(plan("incremental_pairs_documents").contains("GreaterThanOrEqual(doc_id,400)") &&
           plan("incremental_pairs_documents").contains("LessThan(doc_id,400)"),
      "incremental dedup's new/history split not pushed to both scans")
    assert(plan("rrf_hybrid_documents").contains("EqualTo(vec_id,0)"),
      "RRF's single-query equality not pushed")
  }

  test("timed-event doctrine pushes IsNotNull(ts) to the events scan") {
    for (q <- Seq("anomalies_events", "sessions_events", "trend_events",
                  "gapfill_events", "theilsen_events", "pagerank_users"))
      assert(plan(q).contains("IsNotNull(ts)"),
        s"$q: ts null-gate not pushed to the events scan")
  }
}
