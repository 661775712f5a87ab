package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analytics.EventOps
import graft.olap.Reporting

/** Round-11g wave: classic OLAP reporting — per-group leaderboard
  * (WindowGroupLimit), exact integer ratio-to-report, monthly cohort
  * retention.
  */
class R11gOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def li = Tables.load(spark, dir, "lineitem")
  private def ord = Tables.load(spark, dir, "orders")
  private def cust = Tables.load(spark, dir, "customer")
  private def nat = Tables.load(spark, dir, "nation")

  // --- topCustomersByNation --------------------------------------------------

  test("topCustomersByNation: ranks are 1..k per nation, revenue descends") {
    val rows = Reporting.topCustomersByNation(li, ord, cust, nat).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, grp) =>
      val byRank = grp.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq == (1L to byRank.length).toSeq)
      val revs = byRank.map(r => BigDecimal(r.getString(3)))
      assert(revs.zip(revs.tail).forall { case (a, b) => a >= b },
        "revenue must be non-increasing down the ranks")
    }
  }

  test("topCustomersByNation: rank-limit plans as WindowGroupLimit, not a full sort") {
    val plan = Reporting.topCustomersByNation(li, ord, cust, nat)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=n must trigger the two-phase group limit, got:\n$plan")
  }

  // --- revenueShareByNation --------------------------------------------------

  test("revenueShareByNation: shares are exact floor per-milles summing to ≈1000") {
    val rows = Reporting.revenueShareByNation(li, ord, cust, nat).collect()
    assert(rows.nonEmpty)
    val revs   = rows.map(r => BigInt(r.getString(1)))
    val total  = revs.sum
    val shares = rows.map(_.getLong(2))
    rows.zip(revs).foreach { case (r, rev) =>
      assert(BigInt(r.getLong(2)) == (BigInt(1000) * rev) / total,
        s"share for ${r.getString(0)} must be the exact floor per-mille")
    }
    // floor losses: the sum sits within |nations| below 1000
    assert(shares.sum <= 1000 && shares.sum > 1000 - rows.length)
  }

  test("revenueShareByNation: e4 revenue agrees with the decimal revenue report") {
    val e4  = Reporting.revenueShareByNation(li, ord, cust, nat)
      .collect().map(r => r.getString(0) -> BigInt(r.getString(1))).toMap
    val dec = Reporting.revenueByNation(li, ord, cust, nat)
      .collect().map(r => r.getString(0) -> BigDecimal(r.getString(2))).toMap
    assert(e4.keySet == dec.keySet)
    e4.foreach { case (n, v) =>
      assert(BigDecimal(v) == dec(n) * 10000,
        s"integer e4 revenue must equal the decimal rendering ×10⁴ for $n")
    }
  }

  // --- cohorts ---------------------------------------------------------------

  test("cohorts: month-0 diagonal covers every cohort; sizes match first-seen") {
    val events = Tables.load(spark, dir, "events")
    val rows = EventOps.cohorts(events).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getLong(0))
    // every user is active in their own first month: months_since=0 row with
    // n_active == n_cohort == retention 1000
    byCohort.foreach { case (_, grp) =>
      val m0 = grp.find(_.getLong(1) == 0L).get
      assert(m0.getLong(2) == m0.getLong(3) && m0.getLong(4) == 1000L)
    }
    // cohort sizes partition the user population
    val users = events.select("user_id").distinct().count()
    assert(byCohort.values.map(_.head.getLong(3)).sum == users)
    // retention is the exact floor per-mille everywhere
    rows.foreach(r => assert(r.getLong(4) == 1000 * r.getLong(2) / r.getLong(3)))
  }

  test("cohorts: hand-built two-cohort case") {
    // u1,u2 debut in month index m; u1 returns next month; u3 debuts next month
    val ts0 = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2024-02-10 00:00:00")
    val d = Seq(
      (1L, ts0), (2L, ts0), (1L, ts1), (3L, ts1)
    ).toDF("user_id", "ts")
    val rows = EventOps.cohorts(d).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val jan = rows.filter(_ => true) // two cohorts: Jan(size 2), Feb(size 1)
    assert(rows.toSet == Set(
      (0L, 2L, 2L, 1000L), // Jan month 0: both active
      (1L, 1L, 2L, 500L),  // Jan month 1: u1 returned
      (0L, 1L, 1L, 1000L)  // Feb month 0: u3
    ))
    assert(jan.length == 3)
  }
}
