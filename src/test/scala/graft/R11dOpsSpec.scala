package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.stats.NumericStats
import graft.analytics.EventOps

/** Round-11d wave: robust statistics — median/MAD outlier gate, Benford
  * first-digit audit, Theil–Sen robust slope.
  */
class R11dOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // --- madStats --------------------------------------------------------------

  test("madStats: hand-checked median/MAD/outliers on a contaminated column") {
    // values 1..9 plus one wild row: median 5.5, MAD small, the 1e12 flagged
    val d = ((1 to 9).map(_.toDouble) :+ 1e12).toDF("x")
    val r = NumericStats.madStats(d, Seq("x")).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "x")
    assert(row.getDouble(1) == 5.5)  // median of 1..9,1e12 — interpolated (5+6)/2
    assert(row.getDouble(2) == 2.5)  // MAD: deviations 4.5..0.5 + wild; median 2.5
    assert(row.getLong(3) == 1L)     // only the contaminant exceeds 3·1.4826·2.5
  }

  test("madStats: all-null column is skipped, not NPEd") {
    val d = Seq((Some(1.0), Option.empty[Double]), (Some(2.0), None), (Some(3.0), None))
      .toDF("ok", "dead")
    val r = NumericStats.madStats(d, Seq("ok", "dead")).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("ok"))
    assert(r.head.getLong(3) == 0L)
  }

  // --- benford ---------------------------------------------------------------

  test("benford: digits from integer rendering, exact shares, expectations") {
    val lineitem = Tables.load(spark, dir, "lineitem")
    val rows = NumericStats.benford(lineitem, "l_extendedprice").collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val n     = rows.map(_.getLong(1)).sum
    val total = lineitem.where(col("l_extendedprice") > 0).count()
    assert(n == total, "every positive row must contribute exactly one digit")
    rows.foreach { r =>
      val digit = r.getString(0)
      assert(digit.length == 1 && digit.head.isDigit && digit != "0")
      assert(r.getLong(2) == 1000 * r.getLong(1) / n) // exact integer share
      val expected = BigDecimal(math.log10(1.0 + 1.0 / digit.toInt))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == expected)
    }
  }

  test("benford: sub-unit values take the first digit of the scaled integer") {
    val d = Seq(0.04, 0.31, 2.50, 0.001).toDF("x") // 0.001 → 0 cents → excluded
    val got = NumericStats.benford(d, "x")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("4" -> 1L, "3" -> 1L, "2" -> 1L))
  }

  // --- theilSen --------------------------------------------------------------

  test("theilSen: pairwise-median slope shrugs off the spike OLS chases") {
    import java.sql.Timestamp
    // one type, steady +1/day for 10 days with one 100× spike day
    val base = 1700000000000000L // µs
    val rows = (0 until 10).flatMap { day =>
      val n = if (day == 7) 1000 else day + 1
      (0 until n).map(i =>
        (new Timestamp((base + day * 86400000000L) / 1000), s"u$i", "click"))
    }
    val ev = rows.toDF("ts", "user_id", "event_type")
    val r = EventOps.theilSen(ev).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 45L) // C(10,2) pairs
    val slope = r.head.getDouble(2)
    assert(slope == 1.0, s"robust slope should ignore the spike, got $slope")
  }
}
