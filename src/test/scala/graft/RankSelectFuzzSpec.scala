package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.stats.NumericStats

/** Differential fuzz of the rank-select quantile machinery — the distributed
  * two-pass sort plan behind `quantiles` / `groupQuantiles` / `madStats`
  * (NumericStats §8/§14 in PLANS.md) — against straightforward in-JVM
  * sorted-array references implementing the same (n−1)·q interpolation and
  * the same round-6 rendering.
  *
  * The DuckDB oracle gate already pins these operators on the driver
  * testdata; the randomized axis HERE is the value multiset and its
  * partitioning: heavy ties (the rank-offset bookkeeping has to count
  * duplicates, not skip them), negatives, mixed magnitudes (1e-6 next to
  * 1e9), all-null columns, single-row and two-row corpora (floor==ceil rank
  * degeneracies at q=0/1), and 1–7 input partitions (partition boundaries
  * are where the per-(partition, column) offset arithmetic would break).
  * Values are exact-in-double by construction (quarters and small ints), so
  * reference and engine interpolate identical doubles and the comparison is
  * exact equality.
  */
class RankSelectFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  /** Spark's round(col, 6) for DoubleType: BigDecimal.valueOf (shortest
    * decimal rendering) then HALF_UP at scale 6.
    */
  private def round6(v: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(v))
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** The (n−1)·q interpolation in the exact operation order the engine uses. */
  private def refQuantile(sorted: Array[Double], q: Double): Option[Double] =
    if (sorted.isEmpty) None
    else {
      val x  = (sorted.length - 1L) * q
      val lo = sorted(math.floor(x).toInt)
      val hi = sorted(math.ceil(x).toInt)
      Some(round6(lo + (hi - lo) * (x - math.floor(x))))
    }

  /** Value pool engineered for rank hazards: ~10% nulls, heavy small-int
    * ties, exact quarters, negatives, a -1e9 cluster and a 1e-6 cluster.
    */
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

  private val qs = Seq(0.0, 0.1, 0.25, 0.37, 0.5, 0.75, 0.9, 1.0)

  private case class Rec(a: Option[Double], b: Option[Double], c: Option[Double], g: Option[String])

  private def corpus(seed: Long): Seq[Rec] = {
    val rnd = new scala.util.Random(seed)
    val n   = Seq(1, 2, 3, 9, 40, 121)(rnd.nextInt(6))
    (0 until n).map { _ =>
      Rec(
        drawValue(rnd),
        drawValue(rnd),
        if (seed % 2 == 0) None else drawValue(rnd), // even seeds: an all-null column
        if (rnd.nextInt(12) == 0) None else Some(s"g${rnd.nextInt(3)}")
      )
    }
  }

  private def toDF(recs: Seq[Rec], parts: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("a", DoubleType, nullable = true),
      StructField("b", DoubleType, nullable = true),
      StructField("c", DoubleType, nullable = true),
      StructField("g", StringType, nullable = true)
    ))
    val rows = recs.map(r =>
      Row(r.a.map(Double.box).orNull, r.b.map(Double.box).orNull, r.c.map(Double.box).orNull, r.g.orNull))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts), schema)
  }

  private val cols = Seq("a", "b", "c")

  private def colVals(recs: Seq[Rec], c: String): Array[Double] =
    recs.flatMap(r => c match { case "a" => r.a; case "b" => r.b; case _ => r.c }).toArray.sorted

  test("quantiles: two-pass rank select == sorted-array reference on 8 random multisets") {
    for (seed <- 1L to 8L) {
      val recs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 31).nextInt(7)
      val expected = for (c <- cols; q <- qs)
        yield (c, q, refQuantile(colVals(recs, c), q))
      val got = NumericStats.quantiles(toDF(recs, parts), cols, qs).collect().toSeq
        .map(r => (r.getString(0), r.getDouble(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      assert(got == expected.sortBy(r => (r._1, r._2)), s"seed $seed parts $parts n ${recs.size}")
    }
  }

  test("groupQuantiles: grouped rank select == per-group reference on 8 random multisets") {
    for (seed <- 11L to 18L) {
      val recs   = corpus(seed)
      val parts  = 1 + new scala.util.Random(seed * 37).nextInt(7)
      val groups = recs.flatMap(_.g).distinct.sorted
      def groupVals(g: String, c: String): Array[Double] =
        colVals(recs.filter(_.g.contains(g)), c)
      val expected = for (g <- groups; c <- cols; q <- qs)
        yield (g, c, q, refQuantile(groupVals(g, c), q))
      val got = NumericStats.groupQuantiles(toDF(recs, parts), "g", cols, qs).collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      assert(got == expected, s"seed $seed parts $parts n ${recs.size}")
    }
  }

  test("madStats: median/MAD/outlier gate == reference on 8 random multisets") {
    val k = 3.0
    for (seed <- 21L to 28L) {
      val recs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 41).nextInt(7)
      val expected = cols.flatMap { c =>
        val vals = colVals(recs, c)
        refQuantile(vals, 0.5).map { med =>
          // the engine computes deviations from the ROUNDED median, then the
          // rounded median of those — replicate both rounding points
          val mad = refQuantile(vals.map(v => math.abs(v - med)).sorted, 0.5).get
          val nOut = vals.count(v => math.abs(v - med) > (k * 1.4826) * mad).toLong
          (c, med, mad, nOut)
        }
      }
      val got = NumericStats.madStats(toDF(recs, parts), cols, k).collect().toSeq
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      assert(got == expected, s"seed $seed parts $parts n ${recs.size}")
    }
  }
}
