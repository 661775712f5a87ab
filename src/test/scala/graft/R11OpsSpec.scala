package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.olap.{Basket, Skyline}
import graft.analytics.EventOps

/** Round-11 operator wave: Pareto skyline, market-basket co-occurrence,
  * degree-oriented triangle counting, in-session trigram mining, and the
  * exact-integer EWMA smoother.
  */
class R11OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val part     = Tables.load(spark, dir, "part")
  private lazy val lineitem = Tables.load(spark, dir, "lineitem")
  private lazy val events   = Tables.load(spark, dir, "events")

  // --- Skyline --------------------------------------------------------------

  test("skyline: equals the quadratic dominance definition on the real table") {
    val got = Skyline.skyline(part, "p_retailprice", "p_size", Seq("p_partkey"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val all = part.select("p_partkey", "p_retailprice", "p_size")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val brute = all.filter { case (_, p, s) =>
      !all.exists { case (_, p2, s2) => p2 <= p && s2 >= s && (p2 < p || s2 > s) }
    }.sortBy(t => (t._2, t._3, t._1))
    assert(got.toSeq == brute.toSeq)
    assert(got.nonEmpty)
  }

  test("skyline: frontier is a strict price-up size-up staircase over distinct pairs") {
    // min price / max size: a costlier frontier point must offer strictly
    // more size than every cheaper one, else the cheaper one dominates it
    val pairs = Skyline.skyline(part, "p_retailprice", "p_size", Seq("p_partkey"))
      .select("p_retailprice", "p_size").distinct()
      .orderBy("p_retailprice").collect().map(r => (r.getDouble(0), r.getInt(1)))
    pairs.sliding(2).foreach {
      case Array((p1, s1), (p2, s2)) => assert(p1 < p2 && s1 < s2, s"($p1,$s1) !< ($p2,$s2)")
      case _                         =>
    }
  }

  test("skyline: ties on the frontier pair all surface") {
    val df = Seq((1L, 5.0, 10), (2L, 5.0, 10), (3L, 4.0, 3), (4L, 6.0, 11), (5L, 6.0, 2))
      .toDF("k", "price", "sz")
    val got = Skyline.skyline(df, "price", "sz", Seq("k")).select("k").as[Long].collect().toSet
    // frontier pairs: (4.0,3), (5.0,10) ×2, (6.0,11); (6.0,2) dominated by (5.0,10)
    assert(got == Set(1L, 2L, 3L, 4L))
  }

  // --- Basket ---------------------------------------------------------------

  test("copurchase: pair counts match a driver-side self-join on a fixture") {
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L), (1L, 10L), // dup line collapses
      (2L, 10L), (2L, 20L),
      (3L, 10L), (3L, 20L), (3L, 40L),
      (4L, 99L) // singleton order contributes nothing
    ).toDF("l_orderkey", "l_partkey")
    val got = Basket.copurchaseTopK(li, k = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got((10L, 20L)) == 3L)
    assert(got((10L, 30L)) == 1L && got((20L, 30L)) == 1L)
    assert(got((10L, 40L)) == 1L && got((20L, 40L)) == 1L)
    assert(!got.contains((99L, 99L)) && got.size == 5)
  }

  test("copurchase: top-k cut is the total (count desc, a, b) order") {
    val top = Basket.copurchaseTopK(lineitem, k = 20).collect()
      .map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
    val resorted = top.sortBy { case (n, a, b) => (-n, a, b) }
    assert(top.toSeq == resorted.toSeq)
    assert(top.length == 20)
  }

  test("triangles: counts a known graph (two shared triangles on K4 minus an edge)") {
    // orders chosen so every pair below co-occurs in >= 2 orders
    val basket = Seq(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), Seq(1L, 2L, 4L), Seq(1L, 2L, 4L),
      Seq(1L, 3L, 4L), Seq(1L, 3L, 4L), Seq(2L, 3L), Seq(2L, 4L), Seq(3L, 4L))
    val li = basket.zipWithIndex
      .flatMap { case (parts, o) => parts.map(p => (o.toLong, p)) }
      .toDF("l_orderkey", "l_partkey")
    // edges with support>=2: all 6 pairs of {1,2,3,4} except (2,3),(2,4),(3,4)?
    //   (2,3): orders 0,1,6 -> 3;  (2,4): 2,3,7 -> 3;  (3,4): 4,5,8 -> 3  => K4
    val edges = Basket.copurchaseEdges(li, minSupport = 2).collect()
    assert(edges.length == 6)
    val n = Basket.triangleCount(li).collect().head.getLong(0)
    assert(n == 4L) // K4 has exactly 4 triangles
  }

  // --- sessionTrigrams ------------------------------------------------------

  test("sessionTrigrams: trigrams never span a session gap") {
    def ts(minute: Long) = new java.sql.Timestamp(minute * 60000L)
    val ev = Seq(
      (1L, 7L, "a", ts(0)), (2L, 7L, "b", ts(1)), (3L, 7L, "c", ts(2)),
      // 31-minute gap -> new session
      (4L, 7L, "d", ts(33)), (5L, 7L, "e", ts(34)), (6L, 7L, "f", ts(35)),
      (7L, 9L, "a", ts(0)), (8L, 9L, "b", ts(1)), (9L, 9L, "c", ts(2))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = EventOps.sessionTrigrams(ev)
      .collect().map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3))).toMap
    assert(got == Map(("a", "b", "c") -> 2L, ("d", "e", "f") -> 1L))
  }

  // --- ewmaDailyVolume ------------------------------------------------------

  test("ewma: numerator equals the closed-form weighted sum on a fixture") {
    def ts(day: Long) = new java.sql.Timestamp(day * 86400000L)
    val ev = Seq(
      (1L, 1L, "x", ts(0)), (2L, 1L, "x", ts(0)), // day0: 2
      (3L, 1L, "x", ts(1)),                       // day1: 1
      (4L, 1L, "x", ts(3))                        // day3: 1 (day2 missing = 0)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = EventOps.ewmaDailyVolume(ev, horizon = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toList
    // horizon 4, weights 2^3..2^0 by age: day0: 2*8=16; day1: 1*8+2*4=16;
    // day3: 1*8 + 0*4 + 1*2 + 2*1 = 12
    assert(got == List((0L, 2L, 16L), (1L, 1L, 16L), (3L, 1L, 12L)))
  }

  test("ewma: smoother stays inside [min, max]·2^horizon of the window on real data") {
    val rows = EventOps.ewmaDailyVolume(events).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getString(0))
    byType.values.foreach { rs =>
      val counts = rs.map(_.getLong(2))
      val (mn, mx) = (counts.min, counts.max)
      // Σ weights <= 2^20 - 1, so num <= max·2^20; num >= anchor-day weight alone
      rs.foreach { r =>
        assert(r.getLong(3) <= mx * (1L << 20) && r.getLong(3) >= r.getLong(2) * (1L << 19))
      }
      assert(mn >= 0)
    }
  }
}
