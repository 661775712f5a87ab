package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.EventOps

/** Funnel and retention semantics on hand-computed fixtures (cross-engine
  * agreement of the declared forms rides the oracle gate).
  */
class EventOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(day: Int, h: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-${day}%02d $h%02d:00:00")

  private def events(rows: (Long, String, java.sql.Timestamp)*) =
    rows.zipWithIndex.map { case ((u, t, time), i) =>
      (i.toLong, time, u, t, 1.0, Map("k" -> "v"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("funnel: order matters, window bounds from first step, earliest chain") {
    val df = events(
      // user 1: full ordered funnel inside the window → converts all steps
      (1L, "signup", ts(1, 0)), (1L, "view", ts(1, 5)), (1L, "purchase", ts(2, 0)),
      // user 2: view BEFORE signup, no view after → stops at signup
      (2L, "view", ts(1, 0)), (2L, "signup", ts(1, 5)), (2L, "purchase", ts(1, 6)),
      // user 3: completes but outside the 7-day window → stops at view
      (3L, "signup", ts(1, 0)), (3L, "view", ts(2, 0)), (3L, "purchase", ts(20, 0)),
      // user 4: never signs up → counts nowhere
      (4L, "view", ts(1, 0)), (4L, "purchase", ts(1, 1))
    )
    val f = EventOps.funnel(df, Seq("signup", "view", "purchase")).collect()
      .map(r => r.getAs[Long]("step") -> r.getAs[Long]("n_users")).toMap
    assert(f == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("funnel: strictly-after semantics — same-timestamp step does not convert") {
    val df = events((1L, "signup", ts(1, 0)), (1L, "view", ts(1, 0)))
    val f = EventOps.funnel(df, Seq("signup", "view")).collect()
      .map(r => r.getAs[Long]("step") -> r.getAs[Long]("n_users")).toMap
    assert(f == Map(1L -> 1L, 2L -> 0L))
  }

  test("retention: cohort day zero counts everyone, offsets count comebacks") {
    val df = events(
      (1L, "click", ts(1, 0)), (1L, "click", ts(2, 0)), (1L, "click", ts(4, 0)),
      (2L, "click", ts(1, 5)), (2L, "click", ts(1, 9)), // same day twice → one row
      (3L, "click", ts(2, 0)), (3L, "click", ts(4, 0))
    )
    val r = EventOps.retention(df).collect()
      .map(x => (x.getAs[Long]("cohort_day"), x.getAs[Long]("day_offset")) -> x.getAs[Long]("n_users"))
      .toMap
    val d1 = ts(1, 0).getTime * 1000L / 86400000000L
    val d2 = ts(2, 0).getTime * 1000L / 86400000000L
    assert(r((d1, 0L)) == 2L) // users 1, 2 start day 1
    assert(r((d1, 1L)) == 1L) // user 1 back on day 2
    assert(r((d1, 3L)) == 1L) // user 1 back on day 4
    assert(r((d2, 0L)) == 1L) // user 3 starts day 2
    assert(r((d2, 2L)) == 1L) // user 3 back on day 4
    assert(!r.contains((d2, 1L)))
  }
}
