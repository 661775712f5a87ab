package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.ChangeCapture
import graft.quality.Diff
import graft.streaming.StreamCdc

/** Round-10d operator wave: table reconciliation (data diff), partitioned
  * write + pruned read, and the streaming CDC materialized view.
  */
class R10dOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs   = Tables.load(spark, dir, "documents")
  private lazy val orders = Tables.load(spark, dir, "orders")

  // --- Diff -----------------------------------------------------------------

  test("diffSummary: seeded add/remove/change counted exactly") {
    val old = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "s", "v")
    val nw  = Seq((2L, "b", 20), (3L, "CHANGED", 30), (4L, "d", 40)).toDF("k", "s", "v")
    val m = Diff.diffSummary(old, nw, "k", Seq("s", "v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map(
      "added" -> 1L, "removed" -> 1L, "identical" -> 1L,
      "changed__s" -> 1L, "changed__v" -> 0L))
  }

  test("diffSummary: a value going null IS a change (null-safe compare)") {
    val old = Seq((1L, Option("x"))).toDF("k", "s")
    val nw  = Seq((1L, Option.empty[String])).toDF("k", "s")
    val m = Diff.diffSummary(old, nw, "k", Seq("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("changed__s") == 1L && m("identical") == 0L)
  }

  test("diffDocuments: mutation classes all non-zero and mutually consistent") {
    val m = Diff.diffDocuments(docs).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    assert(m("added") > 0 && m("removed") > 0 && m("changed__text") > 0)
    // only text is mutated on surviving keys
    assert(m("changed__lang") == 0 && m("changed__source") == 0 && m("changed__n_chars") == 0)
    val survivors = n - m("removed")
    assert(m("identical") == survivors - m("changed__text"))
  }

  // --- partitioned IO -------------------------------------------------------

  test("partitionedRoundTrip: identity on the filtered slice, read is partition-pruned") {
    val path = s"/tmp/graft_partitioned_spec/${spark.sparkContext.applicationId}/documents"
    val out = graft.io.Sources.partitionedRoundTrip(docs, path, "lang", "en", "doc_id")
    val expected = docs.where($"lang" === "en").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(out.collect().map(_.getLong(0)).toSeq == expected)
    // pruning: the predicate sits in PartitionFilters (directory pruning),
    // not in the data filters of a full scan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      plan.linesIterator.take(8).mkString("\n"))
    val scanned = out.queryExecution.executedPlan.collectLeaves().toString()
    assert(!scanned.contains("lang=zh"), "non-matching partitions must not be listed into the scan")
  }

  // --- streaming CDC --------------------------------------------------------

  test("streamingCdcSnapshot ≡ batch cdcSnapshotOrders") {
    val stream = StreamCdc.streamingCdcSnapshot(spark, dir).collect().toSeq
    val batch  = ChangeCapture.cdcSnapshotOrders(orders).collect().toSeq
    assert(stream == batch)
  }
}
