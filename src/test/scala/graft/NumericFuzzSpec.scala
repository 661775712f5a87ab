package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.EventOps
import graft.stats.NumericStats

/** Differential fuzz of the remaining numeric-profile operators — the ones
  * whose cross-engine determinism rests on the repo's exact-arithmetic
  * conventions (decimal(·,6) sums, round-6 quantile bounds, integer shares,
  * power-of-two EWMA weights). Each runs on random hostile multisets (ties,
  * negatives, 1e-6 next to 1e9, nulls, 1–7 partitions) against an in-JVM
  * reference that replays the declared semantics with java.math.BigDecimal —
  * so a float-accumulation leak, a wrong rounding point, or a
  * partition-order dependence shows up as an exact-string mismatch.
  *
  * Complements RankSelectFuzzSpec (quantiles/groupQuantiles/madStats share
  * its refQuantile) and the DuckDB gate (one corpus, two engines): the
  * randomized axis here is the value multiset.
  */
class NumericFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def round6(v: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(v))
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Spark's cast(double AS decimal(p,s)): HALF_UP over the shortest decimal
    * rendering — the same construction Decimal.fromDouble uses.
    */
  private def dec(v: Double, scale: Int): java.math.BigDecimal =
    new java.math.BigDecimal(java.lang.Double.toString(v))
      .setScale(scale, java.math.RoundingMode.HALF_UP)

  private def refQuantile(sorted: Array[Double], q: Double): Option[Double] =
    if (sorted.isEmpty) None
    else {
      val x  = (sorted.length - 1L) * q
      val lo = sorted(math.floor(x).toInt)
      val hi = sorted(math.ceil(x).toInt)
      Some(round6(lo + (hi - lo) * (x - math.floor(x))))
    }

  private def drawValue(rnd: scala.util.Random): Option[Double] =
    rnd.nextInt(10) match {
      case 0         => None
      case 1         => Some(0.0)
      case 2         => Some(-1.0)
      case 3 | 4 | 5 => Some(rnd.nextInt(4).toDouble)
      case 6         => Some(rnd.nextInt(400) / 4.0 - 50.0)
      case 7         => Some(-1.0e9 + rnd.nextInt(16))
      case 8         => Some(rnd.nextInt(16) * 1.0e-6)
      case _         => Some(1.0e9 - rnd.nextInt(16) * 0.25)
    }

  private case class Rec(id: Long, a: Option[Double], b: Option[Double], c: Option[Double])

  private def corpus(seed: Long): Seq[Rec] = {
    val rnd = new scala.util.Random(seed)
    val n   = Seq(1, 2, 3, 9, 40, 121)(rnd.nextInt(6))
    (0 until n).map { i =>
      Rec(i.toLong, drawValue(rnd), drawValue(rnd),
        if (seed % 2 == 0) None else drawValue(rnd)) // even seeds: an all-null column
    }
  }

  private def toDF(recs: Seq[Rec], parts: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("a", DoubleType, nullable = true),
      StructField("b", DoubleType, nullable = true),
      StructField("c", DoubleType, nullable = true)
    ))
    val rows = recs.map(r =>
      Row(r.id, r.a.map(Double.box).orNull, r.b.map(Double.box).orNull, r.c.map(Double.box).orNull))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts), schema)
  }

  private val cols = Seq("a", "b", "c")

  private def colVals(recs: Seq[Rec], c: String): Array[Double] =
    recs.flatMap(r => c match { case "a" => r.a; case "b" => r.b; case _ => r.c }).toArray.sorted

  test("winsorizedStats: clip counts and exact decimal sum == reference on 8 random multisets") {
    val (pLo, pHi) = (0.05, 0.95)
    for (seed <- 31L to 38L) {
      val recs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 31).nextInt(7)
      val expected = cols.flatMap { c =>
        val vals = colVals(recs, c)
        for (lo <- refQuantile(vals, pLo); hi <- refQuantile(vals, pHi)) yield {
          def clip(v: Double) = if (v < lo) lo else if (v > hi) hi else v
          val wsum = vals.map(v => dec(clip(v), 6))
            .foldLeft(java.math.BigDecimal.ZERO.setScale(6))(_ add _)
          (c, lo, hi, vals.length.toLong,
            vals.count(_ < lo).toLong, vals.count(_ > hi).toLong, wsum.toString)
        }
      }
      val got = NumericStats.winsorizedStats(toDF(recs, parts), cols, pLo, pHi).collect().toSeq
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getString(6)))
      assert(got == expected, s"seed $seed parts $parts n ${recs.size}")
    }
  }

  test("percentileBuckets: round-6 bounds, ties-go-low buckets, exact sums == reference") {
    val k = 4
    for (seed <- 41L to 48L) {
      val recs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 37).nextInt(7)
      val vals  = colVals(recs, "a")
      val expected =
        if (vals.isEmpty) Seq.empty
        else {
          val bounds = (1 until k).map(i => refQuantile(vals, i.toDouble / k).get)
          def bucket(v: Double): Int =
            bounds.zipWithIndex.collectFirst { case (b, i) if v <= b => i + 1 }.getOrElse(k)
          vals.groupBy(bucket).toSeq.sortBy(_._1).map { case (bk, vs) =>
            val s = vs.map(dec(_, 6)).foldLeft(java.math.BigDecimal.ZERO.setScale(6))(_ add _)
            (bk, vs.length.toLong, vs.min, vs.max, s.toString)
          }
        }
      val got = NumericStats.percentileBuckets(toDF(recs, parts), "a", k).collect().toSeq
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getString(4)))
      assert(got == expected, s"seed $seed parts $parts n ${recs.size}")
    }
  }

  test("histogram: floor-division buckets == reference on 8 random multisets") {
    val width = 7.5
    for (seed <- 51L to 58L) {
      val recs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 41).nextInt(7)
      val expected = colVals(recs, "b").toSeq
        .groupBy(v => math.floor(v / width).toLong).toSeq
        .map { case (bk, vs) => (bk, vs.size.toLong) }
        .sortBy(_._1)
      val got = NumericStats.histogram(toDF(recs, parts), "b", width).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got == expected, s"seed $seed parts $parts n ${recs.size}")
    }
  }

  test("benford: integer-rendered leading digits and exact shares == reference") {
    for (seed <- 61L to 66L) {
      val rnd   = new scala.util.Random(seed)
      val n     = 1 + rnd.nextInt(200)
      // money-ish pool with filter bait: nulls, zeros, negatives, sub-cent dust
      val vals = (0 until n).map { _ =>
        rnd.nextInt(12) match {
          case 0 => None
          case 1 => Some(0.0)
          case 2 => Some(-(1 + rnd.nextInt(500)) / 100.0)
          case 3 => Some(rnd.nextInt(4) / 1000.0) // rounds to 0 cents sometimes
          case _ => Some((1 + rnd.nextInt(999999)) / 100.0)
        }
      }
      val expected = vals.flatten
        .filter(_ > 0)
        .map(v => new java.math.BigDecimal(java.lang.Double.toString(v * 100.0))
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue())
        .filter(_ > 0)
        .groupBy(_.toString.take(1)).toSeq.sortBy(_._1) match {
        case ds =>
          val total = ds.map(_._2.size.toLong).sum
          ds.map { case (d, us) =>
            (d, us.size.toLong, 1000L * us.size / total,
              round6(math.log10(1.0 + 1.0 / d.toDouble)))
          }
      }
      val df = vals.zipWithIndex
        .map { case (v, i) => (i.toLong, v) }
        .toDF("id", "amount")
        .repartition(1 + rnd.nextInt(5))
      val got = NumericStats.benford(df, "amount").collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(got == expected, s"seed $seed n $n")
    }
  }

  test("corrEnvelope: exact decimal moment sums == BigDecimal reference") {
    val pairs = Seq(("a", "b"), ("a", "c"), ("b", "c"))
    for (seed <- 71L to 78L) {
      val recs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 43).nextInt(7)
      def field(r: Rec, c: String) = c match { case "a" => r.a; case "b" => r.b; case _ => r.c }
      val expected = pairs.sortBy(identity).map { case (x, y) =>
        val xs = recs.flatMap(r => for (xv <- field(r, x); yv <- field(r, y)) yield (xv, yv))
        def render(s: Seq[java.math.BigDecimal]): Option[String] =
          if (s.isEmpty) None
          else Some(s.foldLeft(java.math.BigDecimal.ZERO)(_ add _)
            .setScale(4, java.math.RoundingMode.HALF_UP).toString)
        val (dx, dy) = (xs.map(p => dec(p._1, 2)), xs.map(p => dec(p._2, 2)))
        (x, y, xs.size.toLong,
          render(dx), render(dy),
          render(dx.map(v => v.multiply(v))), render(dy.map(v => v.multiply(v))),
          render(dx.zip(dy).map { case (vx, vy) => vx.multiply(vy) }))
      }
      val got = NumericStats.corrEnvelope(toDF(recs, parts), pairs).collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), Option(r.getString(3)),
          Option(r.getString(4)), Option(r.getString(5)), Option(r.getString(6)),
          Option(r.getString(7))))
      assert(got == expected, s"seed $seed parts $parts n ${recs.size}")
    }
  }

  test("globalRanks: total-order rank and exact per-mille == reference") {
    for (seed <- 81L to 86L) {
      val recs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 47).nextInt(7)
      val kept  = recs.flatMap(r => r.a.map(v => (r.id, v)))
      if (kept.nonEmpty) {
        val total = kept.size.toLong
        val expected = kept.sortBy { case (id, v) => (v, id) }.zipWithIndex
          .map { case ((id, v), i) => (id, v, i + 1L, 1000L * (i + 1L) / total) }
          .sortBy(_._1)
        val got = NumericStats.globalRanks(toDF(recs, parts), "id", "a").collect().toSeq
          .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
        assert(got == expected, s"seed $seed parts $parts n ${recs.size}")
      }
    }
  }

  test("ewmaDailyVolume: power-of-two integer smoother == reference on random calendars") {
    val horizon = 20
    val schema = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("ts", TimestampType, nullable = true),
      StructField("event_type", StringType, nullable = true)
    ))
    val MicrosPerDay = 86400000000L
    for (seed <- 91L to 96L) {
      val rnd   = new scala.util.Random(seed)
      val n     = 1 + rnd.nextInt(150)
      val types = Seq("a", "b", "c")
      val base  = 1704067200000000L
      // sparse calendar: day gaps larger and smaller than the horizon
      val evs = (0 until n).map { i =>
        val ts = if (rnd.nextInt(15) == 0) None
                 else Some(base + rnd.nextInt(70).toLong * MicrosPerDay + rnd.nextInt(3).toLong * 1000000L)
        val et = if (rnd.nextInt(20) == 0) None else Some(types(rnd.nextInt(types.size)))
        (i.toLong, ts, et)
      }
      // NULL-typed events carry no per-type series (the operator excludes
      // them explicitly; the oracle's JOIN equality agrees)
      val daily = evs.collect { case (_, Some(ts), Some(et)) => (et, ts / MicrosPerDay) }
        .groupBy(identity).map { case (k, occ) => k -> occ.size.toLong }
      val expected = daily.keys.toSeq.map { case (et, day) =>
        val num = (0 until horizon).map { j =>
          daily.getOrElse((et, day - j), 0L) << (horizon - 1 - j)
        }.sum
        (et, day, daily((et, day)), num)
      }.sortBy(r => (r._1, r._2))

      val rows = evs.map { case (id, ts, et) =>
        Row(id, ts.map(us => java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))).orNull,
          et.orNull)
      }
      val df  = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1 + rnd.nextInt(5)), schema)
      val got = EventOps.ewmaDailyVolume(df, horizon).collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got == expected, s"seed $seed n $n")
    }
  }
}
