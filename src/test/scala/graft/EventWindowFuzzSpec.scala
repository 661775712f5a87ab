package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.EventOps

/** Differential fuzz of the day-grain monitoring operators — rolling
  * windows, the exact-integer anomaly z-test, least-squares trend sums,
  * the first-seen prefix identity, freshness lags and inter-arrival
  * quantiles — against in-JVM references on random sparse calendars.
  *
  * The hazards probed here are windowing ones the DuckDB gate's single
  * corpus can't sweep: RANGE vs ROWS frames over calendars with gaps,
  * baseline windows shorter than minBaseline, NULL event_type as its own
  * series (kept by the day-grain groupBys, dropped by groupQuantiles'
  * string-cast group key), single-observation types, and same-day ties.
  * Counts and moments are replayed in BigInt/BigDecimal so an integer
  * wrap or a float accumulation on the engine side cannot hide.
  */
class EventWindowFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  private val MicrosPerDay = 86400000000L

  private case class Ev(id: Long, ts: Option[Long], user: Option[Long], etype: Option[String])

  /** Sparse multi-day calendar: ~70 candidate days, several events per day,
    * NULL ts/user/etype sprinkled, same-µs ties common.
    */
  private def corpus(seed: Long): Seq[Ev] = {
    val rnd   = new scala.util.Random(seed)
    val types = Seq("a", "b", "c")
    val base  = 1704067200000000L
    val n     = 40 + rnd.nextInt(160)
    (0 until n).map { i =>
      val ts =
        if (rnd.nextInt(20) == 0) None
        else Some(base + rnd.nextInt(70).toLong * MicrosPerDay +
          rnd.nextInt(4).toLong * 3600000000L + rnd.nextInt(2).toLong * 1000000L)
      val user  = if (rnd.nextInt(15) == 0) None else Some(rnd.nextInt(8).toLong)
      val etype = if (rnd.nextInt(18) == 0) None else Some(types(rnd.nextInt(types.size)))
      Ev(i.toLong, ts, user, etype)
    }
  }

  private def toDF(evs: Seq[Ev], parts: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = true),
      StructField("user_id", LongType, nullable = true),
      StructField("event_type", StringType, nullable = true)
    ))
    val rows = evs.map { e =>
      Row(e.id, e.ts.map(us => java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))).orNull,
        e.user.map(Long.box).orNull, e.etype.orNull)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts), schema)
  }

  /** None sorts first — Spark's default ascending null ordering. */
  private def etKey(et: Option[String]): (Int, String) = (if (et.isEmpty) 0 else 1, et.getOrElse(""))

  /** (etype, day) -> events, timed rows only. */
  private def byTypeDay(evs: Seq[Ev]): Map[(Option[String], Long), Seq[Ev]] =
    evs.filter(_.ts.isDefined).groupBy(e => (e.etype, e.ts.get / MicrosPerDay))

  test("rollingDaily: RANGE frame over a gapped calendar == reference") {
    val windowDays = 7
    for (seed <- 1L to 6L) {
      val evs   = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 31).nextInt(5)
      val daily = byTypeDay(evs).map { case ((et, day), es) =>
        (et, day, es.size.toLong, es.flatMap(_.user).distinct.size.toLong)
      }.toSeq
      val expected = daily.map { case (et, day, n, nu) =>
        val roll = daily.collect {
          case (et2, d2, n2, _) if et2 == et && d2 >= day - (windowDays - 1) && d2 <= day => n2
        }.sum
        (et, day, n, nu, roll)
      }.sortBy(r => (etKey(r._1), r._2))
      val got = EventOps.rollingDaily(toDF(evs, parts), windowDays).collect().toSeq
        .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(got == expected, s"seed $seed n ${evs.size}")
    }
  }

  test("dailyAnomalies: trailing-rows exact-integer z-test == BigInt reference") {
    val (windowDays, z, minBaseline) = (28, 3, 7)
    for (seed <- 11L to 16L) {
      val evs   = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 37).nextInt(5)
      val daily = byTypeDay(evs).map { case ((et, day), es) => (et, day, es.size.toLong) }.toSeq
      val expected = daily.groupBy(_._1).toSeq.flatMap { case (et, rows) =>
        val series = rows.sortBy(_._2)
        series.zipWithIndex.map { case ((_, day, x), i) =>
          val baseline = series.slice(math.max(0, i - windowDays), i).map(_._3)
          val m  = BigInt(baseline.size)
          val s  = baseline.map(BigInt(_)).sum
          val s2 = baseline.map(v => BigInt(v) * v).sum
          val dev = m * x - s
          val anom = baseline.size >= minBaseline &&
            dev * dev * (m - 1) > BigInt(z.toLong * z) * m * (m * s2 - s * s)
          (et, day, x, baseline.size.toLong, anom)
        }
      }.sortBy(r => (etKey(r._1), r._2))
      val got = EventOps.dailyAnomalies(toDF(evs, parts), windowDays, z, minBaseline)
        .collect().toSeq
        .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      assert(got == expected, s"seed $seed n ${evs.size}")
    }
  }

  test("volumeTrend: least-squares moment sums and 128-bit slope terms == reference") {
    for (seed <- 21L to 26L) {
      val evs   = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 41).nextInt(5)
      val daily = byTypeDay(evs).map { case ((et, day), es) => (et, day, es.size.toLong) }.toSeq
      val expected = daily.groupBy(_._1).toSeq.map { case (et, rows) =>
        val m  = rows.size.toLong
        val st = rows.map(_._2).sum
        val sy = rows.map(_._3).sum
        val sty = rows.map(r => r._2 * r._3).sum
        val stt = rows.map(r => r._2 * r._2).sum
        val num = (BigInt(m) * sty - BigInt(st) * sy).toString
        val den = (BigInt(m) * stt - BigInt(st) * st).toString
        (et, m, st, sy, sty, stt, num, den)
      }.sortBy(r => etKey(r._1))
      val got = EventOps.volumeTrend(toDF(evs, parts)).collect().toSeq
        .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getString(6), r.getString(7)))
      assert(got == expected, s"seed $seed n ${evs.size}")
    }
  }

  test("cumulativeUsers: first-seen prefix identity == running-distinct reference") {
    for (seed <- 31L to 36L) {
      val evs   = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 43).nextInt(5)
      val timed = evs.filter(_.ts.isDefined)
      // NULL user_id is a group key in the debut aggregate: one distinct "user"
      val debuts = timed.groupBy(_.user).map { case (_, es) => es.map(_.ts.get / MicrosPerDay).min }
      val days   = debuts.groupBy(identity).map { case (d, occ) => d -> occ.size.toLong }.toSeq.sortBy(_._1)
      val expected = days.zipWithIndex.map { case ((d, nNew), i) =>
        (d, nNew, days.take(i + 1).map(_._2).sum)
      }
      if (timed.nonEmpty) {
        val got = EventOps.cumulativeUsers(toDF(evs, parts)).collect().toSeq
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        assert(got == expected, s"seed $seed n ${evs.size}")
        // the identity itself: n_cum(d) == |distinct users with any event <= d|
        expected.foreach { case (d, _, cum) =>
          val direct = timed.filter(_.ts.get / MicrosPerDay <= d).map(_.user).distinct.size
          assert(cum == direct, s"seed $seed day $d: prefix $cum != direct $direct")
        }
      }
    }
  }

  test("freshness: per-type extremes and lag behind corpus max == reference") {
    for (seed <- 41L to 46L) {
      val evs   = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 47).nextInt(5)
      val timed = evs.filter(_.ts.isDefined)
      if (timed.nonEmpty) {
        val perType = timed.groupBy(_.etype).toSeq.map { case (et, es) =>
          val us = es.map(_.ts.get)
          (et, es.size.toLong, us.min, us.max)
        }
        val newest = perType.map(_._4).max
        val expected = perType.map { case (et, n, first, last) =>
          (et, n, first, last, newest - last)
        }.sortBy(r => etKey(r._1))
        val got = EventOps.freshness(toDF(evs, parts)).collect().toSeq
          .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        assert(got == expected, s"seed $seed n ${evs.size}")
      }
    }
  }

  test("interArrival: per-type gap quantiles == sorted-gap reference (NULL type dropped)") {
    val qs = Seq(0.5, 0.95)
    def round6(v: Double): Double =
      new java.math.BigDecimal(java.lang.Double.toString(v))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def refQuantile(sorted: Array[Double], q: Double): Double = {
      val x  = (sorted.length - 1L) * q
      val lo = sorted(math.floor(x).toInt)
      val hi = sorted(math.ceil(x).toInt)
      round6(lo + (hi - lo) * (x - math.floor(x)))
    }
    for (seed <- 51L to 56L) {
      val evs   = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 53).nextInt(5)
      // gaps of the per-type us-sorted sequence; consecutive differences of a
      // sorted multiset are tie-invariant. groupQuantiles drops the NULL group.
      val expected = evs.filter(e => e.ts.isDefined && e.etype.isDefined)
        .groupBy(_.etype.get).toSeq
        .flatMap { case (et, es) =>
          val us = es.map(_.ts.get).sorted
          val gaps = us.zip(us.tail).map { case (a, b) => (b - a).toDouble / 1e6 }.toArray.sorted
          // a single-event type has NO gap rows, so it never reaches the
          // quantile stage at all (no (et, q, null) placeholder)
          if (gaps.isEmpty) Seq.empty
          else qs.map(q => (et, q, Some(refQuantile(gaps, q)): Option[Double]))
        }
        .sortBy(r => (r._1, r._2))
      val got = EventOps.interArrival(toDF(evs, parts), qs).collect().toSeq
        .map(r => (r.getString(0), r.getDouble(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      assert(got == expected, s"seed $seed n ${evs.size}")
    }
  }
}
