package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.EventOps

/** Funnel and retention semantics on hand-computed fixtures (cross-engine
  * agreement of the declared forms rides the oracle gate).
  */
class EventOpsSpec extends AnyFunSuite {

  test("asOf: most recent at-or-before row per key; inclusive; highest-tie wins; null when none") {
    val spark0 = SparkTestBase.spark
    import spark0.implicits._
    val left = Seq(
      (1L, 10L, 100L), // key 10, t=100 → right t=100 included (inclusive), tie → orderkey 7
      (2L, 10L, 150L), // → t=120 row (orderkey 9)
      (3L, 10L, 50L),  // before everything → null
      (4L, 20L, 999L)  // key with no right rows → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 100L, 6L, 60.0),
      (10L, 100L, 7L, 70.0), // same (key, t) — tie resolves to orderkey 7
      (10L, 120L, 9L, 90.0)
    ).toDF("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    val got = graft.analytics.AsOfJoin.asOf(
      left, "user_id", "ts", right, "o_custkey", "o_orderdate",
      attrs = Seq("o_orderkey", "o_totalprice"), tieBreak = "o_orderkey"
    ).collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getDouble(4))))).toMap
    assert(got(1L) == Some((7L, 70.0)), s"inclusive + tie: ${got(1L)}")
    assert(got(2L) == Some((9L, 90.0)))
    assert(got(3L).isEmpty && got(4L).isEmpty)
  }

  test("range join: overlap duplicates, boundary semantics, and a hash-join plan") {
    val spark0 = SparkTestBase.spark
    import spark0.implicits._
    import graft.analytics.RangeJoin
    val fact = Seq((1L, 2500.0), (2L, 12500.0), (3L, 10000.0), (4L, 99.0)).toDF("id", "v")
    val bands = Seq(RangeJoin.Band(0L, 0.0, 15000.0), RangeJoin.Band(1L, 10000.0, 25000.0))
    val got = RangeJoin.joinBands(fact, "v", bands, grid = 5000.0)
      .select("id", "band_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 2500 → band 0 only; 12500 → both (overlap); 10000 → both (lo inclusive);
    // 99 → band 0 (hi of nothing excludes it from band 1)
    assert(got == Set((1L, 0L), (2L, 0L), (2L, 1L), (3L, 0L), (3L, 1L), (4L, 0L)), got.toString)
    // the plan must be a broadcast HASH join on the cell, not a nested loop
    val p = RangeJoin.joinBands(fact, "v", bands, grid = 5000.0)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("ordersAsOf on real data: every enrichment is genuinely at-or-before") {
    val spark0 = SparkTestBase.spark
    val events = Tables.load(spark0, "/root/testdata/sf0.001", "events")
    val orders = Tables.load(spark0, "/root/testdata/sf0.001", "orders")
    val enriched = graft.analytics.AsOfJoin.ordersAsOf(events, orders)
    // join back to orders: the matched order must exist, belong to the user,
    // and not postdate the event
    import org.apache.spark.sql.functions.col
    val checked = enriched.where(col("asof_orderkey") =!= -1L)
      .join(orders, enriched("asof_orderkey") === orders("o_orderkey"))
      .join(events.select(col("event_id"), col("ts")), "event_id")
    val bad = checked.where(col("o_custkey") =!= col("user_id") || col("o_orderdate") > col("ts")).count()
    assert(bad == 0)
    assert(enriched.count() == events.count()) // left semantics: one row per event
  }

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

  test("rollingDaily: RANGE frame sums by day value across calendar gaps") {
    // days 1, 2, 10: the day-10 window [4..10] must NOT include days 1-2
    val df = events(
      (1L, "click", ts(1, 0)), (2L, "click", ts(1, 1)),
      (1L, "click", ts(2, 0)),
      (1L, "click", ts(10, 0)), (1L, "click", ts(10, 1)), (3L, "click", ts(10, 2))
    )
    val rows = EventOps.rollingDaily(df, windowDays = 7).collect()
    val d1 = ts(1, 0).getTime * 1000L / 86400000000L
    val byDay = rows.map(r => r.getAs[Long]("day") -> r).toMap
    assert(byDay(d1).getAs[Long]("n_events") == 2L && byDay(d1).getAs[Long]("n_users") == 2L)
    assert(byDay(d1).getAs[Long]("roll_events") == 2L)
    assert(byDay(d1 + 1).getAs[Long]("roll_events") == 3L)      // day2 window covers day1
    assert(byDay(d1 + 9).getAs[Long]("roll_events") == 3L)      // day10 window excludes days 1-2
    assert(byDay(d1 + 9).getAs[Long]("n_users") == 2L)          // users 1, 3
  }

  test("propsStats: JSON k extracted per type, malformed payloads counted but not summed") {
    val spark0 = SparkTestBase.spark
    import spark0.implicits._
    val df = Seq(
      (1L, "a", """{"k": 10}"""),
      (2L, "a", """{"k": 32}"""),
      (3L, "a", """not json"""),   // extraction → null
      (4L, "b", """{"other": 1}""") // path missing → null
    ).toDF("event_id", "event_type", "props")
    val got = EventOps.propsStats(df).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got("a") == ((3L, 2L, 42L)))
    assert(got("b") == ((1L, 0L, -1L))) // no extractable k → null sum
  }

  test("transitions: per-user consecutive pairs, ts tie broken by event_id, no cross-user edges") {
    val spark0 = SparkTestBase.spark
    import spark0.implicits._
    val df = Seq(
      // user 1: a → b → c (b and c share a timestamp — event_id orders them)
      (10L, 1L, "a", new java.sql.Timestamp(1000L)),
      (11L, 1L, "b", new java.sql.Timestamp(2000L)),
      (12L, 1L, "c", new java.sql.Timestamp(2000L)),
      // user 2: a → b (no edge to user 1's timeline)
      (20L, 2L, "a", new java.sql.Timestamp(1500L)),
      (21L, 2L, "b", new java.sql.Timestamp(2500L))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = EventOps.transitions(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 2L, ("b", "c") -> 1L))
  }

  test("dailyAnomalies: spike flags once the baseline is deep enough; noise within ±3σ stays silent") {
    val spark0 = SparkTestBase.spark
    import spark0.implicits._
    // type x: 10 flat days of 10/day, then a 3× spike (fires: zero-variance
    // baseline, any deviation breaks the inequality strictly);
    // type y: alternating 9/11 then an 11 (|dev|=1σ·small — silent)
    val series = Seq(
      "x" -> (Seq.fill(10)(10) :+ 30),
      "y" -> (Seq.tabulate(10)(i => if (i % 2 == 0) 9 else 11) :+ 11)
    )
    val rows = for {
      (tpe, counts) <- series
      (c, d)        <- counts.zipWithIndex
      i             <- 0 until c
    } yield (new java.sql.Timestamp(d.toLong * 86400000L + i * 1000L), s"u$i", tpe)
    val df = rows.toDF("ts", "user_id", "event_type")
    val out = EventOps.dailyAnomalies(df, windowDays = 28, z = 3, minBaseline = 7).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getBoolean(4))))
      .toMap
    assert(out.size == 22)
    assert(out(("x", 10L)) == ((30L, true)), "the spike must flag")
    // nothing else flags: early days fail minBaseline, flat/noisy days pass the σ gate
    for (((tpe, day), (_, anom)) <- out if (tpe, day) != (("x", 10L)))
      assert(!anom, s"false positive at ($tpe, $day)")
  }
}
