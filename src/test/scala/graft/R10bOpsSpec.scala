package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.ChangeCapture
import graft.quality.Checks
import graft.report.Reshape
import graft.text.Packing

/** Round-10b operator wave: declarative constraint suite, CDC changelog
  * compaction, wide→long melt, padding-waste planning. Cross-engine
  * agreement of the declared forms is the oracle gate's job; these specs
  * prove the operator properties the oracles can't express.
  */
class R10bOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val orders   = Tables.load(spark, "/root/testdata/sf0.001", "orders")
  private lazy val customer = Tables.load(spark, "/root/testdata/sf0.001", "customer")
  private lazy val docs     = Tables.load(spark, "/root/testdata/sf0.001", "documents")
  private lazy val lineitem = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")

  // --- Checks ---------------------------------------------------------------

  test("orderChecks: one row per rule, n_rows constant, passed ≡ violations==0") {
    val rows = Checks.orderChecks(orders, customer).collect()
    val expected = ("unique_o_orderkey" +: Checks.OrdersRules.map(_.name)).toSet
    assert(rows.map(_.getString(0)).toSet == expected)
    assert(rows.map(_.getLong(1)).distinct.length == 1) // same n_rows on every rule row
    rows.foreach(r => assert(r.getBoolean(3) == (r.getLong(2) == 0L), r.getString(0)))
  }

  test("orderChecks: violations detect seeded defects") {
    // corrupt a copy of orders: null FK, dangling FK, bad status, dup key
    val dirty = orders.limit(10).selectExpr(
      "CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE -o_orderkey END AS o_custkey", // null + dangling
      "1 AS o_orderkey", // every key identical → n-1 dup violations
      "'X' AS o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"
    )
    val byRule = Checks.orderChecks(dirty, customer).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val n = dirty.count()
    assert(byRule("unique_o_orderkey") == n - 1)
    assert(byRule("status_domain") == n)
    assert(byRule("complete_custkey") > 0)
    // every non-null (negative) custkey dangles; nulls also count as ref violations
    assert(byRule("ref_custkey_customer") == n)
  }

  test("orderChecks plan: one aggregate job, broadcast referential join") {
    val p = Checks.orderChecks(orders, customer).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.take(5).mkString("\n"))
    assert(!p.contains("SortMergeJoin"))
  }

  // --- ChangeCapture --------------------------------------------------------

  test("applyChangelog: latest-wins, tombstones remove the key") {
    val changes = Seq(
      (1L, 1L, "U", "a"), (1L, 3L, "U", "c"), (1L, 2L, "U", "b"), // key 1 → seq 3 wins
      (2L, 1L, "U", "x"), (2L, 2L, "D", "y"),                     // key 2 → deleted
      (3L, 5L, "D", "p"), (3L, 6L, "U", "q")                      // delete then re-insert
    ).toDF("k", "seq", "op", "v")
    val out = ChangeCapture.applyChangelog(changes, "k", "seq", "op")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(out.toSeq == Seq((1L, 3L, "c"), (3L, 6L, "q")))
  }

  test("cdcSnapshotOrders: snapshot keys = custkeys whose max-seq record is not a tombstone") {
    val log = ChangeCapture.ordersChangelog(orders)
    val latestOps = log.groupBy("o_custkey")
      .agg(org.apache.spark.sql.functions.max_by($"op", $"seq").as("last_op"))
    val expected = latestOps.where($"last_op" =!= "D").count()
    assert(ChangeCapture.cdcSnapshotOrders(orders).count() == expected)
  }

  test("cdc plan: rank-1 filter pushes to map-side WindowGroupLimit") {
    val p = ChangeCapture.cdcSnapshotOrders(orders).queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p.linesIterator.take(8).mkString("\n"))
  }

  // --- Reshape --------------------------------------------------------------

  test("unpivotStats: |measures|×|groups| rows, counts conserve the scan") {
    val out = Reshape.unpivotStats(lineitem, "l_returnflag", SparkEntry.meltMeasures).collect()
    val nFlags = lineitem.select("l_returnflag").distinct().count()
    assert(out.length == SparkEntry.meltMeasures.size * nFlags)
    // every measure is non-null in lineitem, so each melts to exactly n rows
    val n = lineitem.count()
    SparkEntry.meltMeasures.foreach { m =>
      assert(out.filter(_.getString(0) == m).map(_.getLong(2)).sum == n, m)
    }
  }

  test("unpivotStats plan: native melt is one Expand, no union of scans") {
    val p = Reshape.unpivotStats(lineitem, "l_returnflag", SparkEntry.meltMeasures)
      .queryExecution.executedPlan.toString
    assert(p.contains("Expand"))
    assert(!p.contains("Union"))
  }

  // --- Packing.paddingReport ------------------------------------------------

  test("paddingReport: buckets hold their docs, waste in [0,1), docs conserve") {
    val rows = Packing.paddingReport(docs).collect()
    assert(rows.map(_.getLong(1)).sum == docs.count())
    rows.foreach { r =>
      val (bucket, nDocs, nToks, padded, waste) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(Packing.BucketLadder.contains(bucket) || bucket == Packing.BucketCap)
      assert(padded == bucket * nDocs)
      assert(nToks <= padded || bucket == Packing.BucketCap) // cap bucket may overflow (truncation)
      assert(waste >= 0.0 == (nToks <= padded))
      assert(waste < 1.0)
    }
  }

  test("paddingReport: a doc on a bucket boundary pads with zero waste") {
    val exact = Seq.tabulate(1)(_ => (1L, Seq.fill(64)("t").mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Packing.paddingReport(exact).collect().head
    assert(r.getLong(0) == 64L && r.getDouble(4) == 0.0)
  }
}
