package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.analytics.EventOps

/** Round-11e wave: the ingest-monitoring trio — cumulative distinct
  * audience, per-type freshness lag, inter-arrival cadence quantiles.
  */
class R11eOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val DayUs = 86400000000L
  private val base  = 1700000000000000L // µs

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (us, u, t) => (new Timestamp(us / 1000), u, t) }
      .toDF("ts", "user_id", "event_type")

  // --- cumulativeUsers -------------------------------------------------------

  test("cumulativeUsers: returning users never recount; prefix sum is exact") {
    val d = ev(
      (base, "a", "x"), (base, "b", "x"),            // day 0: a, b debut
      (base + DayUs, "a", "x"),                      // day 1: only a returns
      (base + 2 * DayUs, "c", "x"), (base + 2 * DayUs, "a", "x")) // day 2: c debuts
    val got = EventOps.cumulativeUsers(d)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toList
    assert(got == List((2L, 2L), (1L, 3L))) // day 1 vanishes: no debuts that day
  }

  test("cumulativeUsers: final total equals global distinct users") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val rows = EventOps.cumulativeUsers(events).collect()
    assert(rows.last.getLong(2) == events.select("user_id").distinct().count())
    // monotone non-decreasing running total
    assert(rows.map(_.getLong(2)).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }

  // --- freshness -------------------------------------------------------------

  test("freshness: lag is measured against the corpus-wide newest event") {
    val d = ev(
      (base, "u", "live"), (base + 3 * DayUs, "u", "live"),
      (base, "u", "stale"), (base + DayUs, "u", "stale"))
    val got = EventOps.freshness(d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4))).toList
    assert(got == List(("live", 2L, 0L), ("stale", 2L, 2 * DayUs)))
  }

  // --- interArrival ----------------------------------------------------------

  test("interArrival: gaps are tie-invariant and quantiles interpolate") {
    // offsets are ms-scale: the Timestamp fixture constructor is ms-granular
    val d = ev(
      (base, "u1", "t"), (base + 10000L, "u2", "t"), (base + 10000L, "u3", "t"),
      (base + 40000L, "u4", "t")) // gaps s: 0.01, 0, 0.03 → median 0.01, p95 0.028
    val got = EventOps.interArrival(d)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toList
    assert(got == List(("t", 0.5, 0.01), ("t", 0.95, 0.028)))
  }

  test("interArrival: singleton types produce no gap rows") {
    val d = ev((base, "u", "solo"), (base, "u", "pair"), (base + 5000L, "u", "pair"))
    val got = EventOps.interArrival(d, Seq(0.5))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toList
    assert(got == List(("pair", 0.005)))
  }
}
