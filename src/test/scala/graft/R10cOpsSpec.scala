package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.EventOps
import graft.olap.Reporting
import graft.stats.NumericStats

/** Round-10c operator wave: star-join OLAP reporting, calendar-spine gap
  * fill, and equi-depth percentile bucketing. The declared forms hash-check
  * cross-engine; these specs pin the plan shapes and conservation laws.
  */
class R10cOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val dir = "/root/testdata/sf0.001"
  private lazy val lineitem = Tables.load(spark, dir, "lineitem")
  private lazy val orders   = Tables.load(spark, dir, "orders")
  private lazy val customer = Tables.load(spark, dir, "customer")
  private lazy val nation   = Tables.load(spark, dir, "nation")
  private lazy val events   = Tables.load(spark, dir, "events")

  // --- Reporting ------------------------------------------------------------

  test("revenueByNation: every lineitem lands in exactly one nation row") {
    val rows = Reporting.revenueByNation(lineitem, orders, customer, nation).collect()
    assert(rows.map(_.getLong(1)).sum == lineitem.count()) // FKs are total (checks_orders proves it)
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
  }

  test("revenueByNation plan: nation broadcast, facts hash-joined") {
    val p = Reporting.revenueByNation(lineitem, orders, customer, nation)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), "nation dim should broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("topCustomers: N rows in strictly ranked order, via TakeOrdered not a global sort") {
    val df = Reporting.topCustomers(lineitem, orders, customer, n = 20)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.linesIterator.take(4).mkString("\n"))
    val revs = df.collect().map(r => BigDecimal(r.getString(2)))
    assert(revs.length == 20)
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  // --- gap fill -------------------------------------------------------------

  test("gapFilledHourly: dense spine, zeros flagged, counts conserve") {
    val rows = EventOps.gapFilledHourly(events).collect()
    val types = rows.map(_.getString(0)).distinct
    val hours = rows.map(_.getLong(1))
    val span  = hours.max - hours.min + 1
    assert(rows.length == types.length * span) // every (type, hour) present
    assert(rows.map(_.getLong(2)).sum == events.count())
    rows.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(2) == 0L)) // is_gap ≡ zero-filled
    }
    assert(rows.exists(_.getBoolean(3)), "sf0.001 has real hourly gaps")
  }

  // --- percentile buckets ---------------------------------------------------

  test("percentileBuckets: equi-depth within interpolation slack, envelopes ordered") {
    val rows = NumericStats.percentileBuckets(customer, "c_acctbal", k = 10).collect()
    val n = customer.where("c_acctbal IS NOT NULL").count()
    assert(rows.map(_.getLong(1)).sum == n)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10)) // all buckets populated
    // depth: each bucket within ±2 of n/10 (boundary interpolation slack)
    rows.foreach(r => assert(math.abs(r.getLong(1) - n / 10.0) <= 2.0, r.toString))
    // bucket value ranges are disjoint and ascending
    val sorted = rows.sortBy(_.getInt(0))
    sorted.zip(sorted.tail).foreach { case (lo, hi) =>
      assert(lo.getDouble(3) <= hi.getDouble(2), s"$lo !< $hi")
    }
  }

  test("percentileBuckets plan: bucketing pass is map-only over scalar bounds") {
    val df = NumericStats.percentileBuckets(customer, "c_acctbal", k = 4)
    val p = df.queryExecution.executedPlan.toString
    // no window, no join: the CASE is inlined literals, the only exchange is
    // the k-row aggregate's
    assert(!p.contains("Window") && !p.contains("Join"), p.linesIterator.take(6).mkString("\n"))
  }
}
