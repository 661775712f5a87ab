package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.quality.{Checks, Diff}
import graft.report.Reshape

/** Differential fuzz of the reconciliation / constraint / reshape layer
  * against in-JVM references. Contracts pinned: diffSummary's comparisons
  * are null-safe (a value GOING null is a change; both-null is identical),
  * added/removed come from presence flags on a full outer join; ruleReport's
  * uniqueness metric is `count(*) − count(DISTINCT key)` so NULL keys count
  * as violations (distinct excludes them), the referential rule fires on
  * null AND dangling FKs through a broadcast left join, and regex rules are
  * anchored Java-dialect; unpivotStats drops NULL measure values BEFORE
  * grouping (SQL-standard EXCLUDE NULLS) and renders sums as DECIMAL(28,6)
  * HALF_UP strings; orderItemsConsistency's drift arithmetic is exact
  * decimal — (1−d)(1+t) at scale 4, price product at scale 6 — with
  * headerless orders counted but never summed.
  */
class DiffChecksFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  private def bd(d: Double, scale: Int): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(d).setScale(scale, java.math.RoundingMode.HALF_UP)

  // --- diffSummary -----------------------------------------------------------

  private case class V(a: String, b: java.lang.Long)

  private def version(seed: Long): Map[Long, V] = {
    val rnd = new scala.util.Random(seed)
    (0 until 40 + rnd.nextInt(40)).map { i =>
      i.toLong -> V(
        if (rnd.nextInt(5) == 0) null else s"v${rnd.nextInt(4)}",
        if (rnd.nextInt(5) == 0) null else java.lang.Long.valueOf(rnd.nextInt(5).toLong))
    }.toMap
  }

  private def vDF(m: Map[Long, V], parts: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("a", StringType, nullable = true),
      StructField("b", LongType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(m.toSeq.map { case (k, v) => Row(k, v.a, v.b) }, parts), schema)
  }

  test("diffSummary == presence/null-safe-change reference") {
    for (seed <- 1L to 8L) {
      val rnd    = new scala.util.Random(seed * 7)
      val oldV   = version(seed)
      // new version: mutate ~1/3, drop ~1/5, add fresh keys
      val newV = oldV.collect {
        case (k, v) if rnd.nextInt(5) != 0 =>
          k -> (if (rnd.nextInt(3) == 0)
            V(if (rnd.nextInt(4) == 0) null else s"v${rnd.nextInt(4)}",
              if (rnd.nextInt(4) == 0) null else java.lang.Long.valueOf(rnd.nextInt(5).toLong))
          else v)
      } ++ (1000L until 1000L + rnd.nextInt(10)).map(_ -> V("fresh", 1L))
      val got = Diff.diffSummary(vDF(oldV, 1 + rnd.nextInt(4)), vDF(newV, 1 + rnd.nextInt(4)), "k", Seq("a", "b"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val keys      = oldV.keySet ++ newV.keySet
      val added     = keys.count(k => !oldV.contains(k)).toLong
      val removed   = keys.count(k => !newV.contains(k)).toLong
      val both      = keys.filter(k => oldV.contains(k) && newV.contains(k))
      def same(x: AnyRef, y: AnyRef): Boolean = (x == null && y == null) || (x != null && x == y)
      val identical = both.count { k => same(oldV(k).a, newV(k).a) && same(oldV(k).b, newV(k).b) }.toLong
      val chA       = both.count(k => !same(oldV(k).a, newV(k).a)).toLong
      val chB       = both.count(k => !same(oldV(k).b, newV(k).b)).toLong
      val expected = Seq("added" -> added, "changed__a" -> chA, "changed__b" -> chB,
        "identical" -> identical, "removed" -> removed)
      assert(got == expected, s"seed $seed")
    }
  }

  // --- ruleReport ------------------------------------------------------------

  private case class Ord(okey: java.lang.Long, custkey: java.lang.Long, total: java.lang.Double,
      status: String, priority: String)

  private val priorities = Array("1-URGENT", "2-HIGH", "3-MEDIUM", "9-LOW", "0-BAD", "1-bad", "1-", null)
  private val statuses   = Array("O", "F", "P", "X", null)

  private def ordersGen(seed: Long): Seq[Ord] = {
    val rnd = new scala.util.Random(seed)
    (0 until 40 + rnd.nextInt(60)).map { i =>
      Ord(
        if (rnd.nextInt(12) == 0) null else java.lang.Long.valueOf(rnd.nextInt(30).toLong), // dup + null keys
        if (rnd.nextInt(8) == 0) null else java.lang.Long.valueOf(rnd.nextInt(20).toLong),
        if (rnd.nextInt(10) == 0) null
        else java.lang.Double.valueOf((rnd.nextInt(4000000) - 400000) / 100.0 * (if (rnd.nextInt(6) == 0) 100 else 1)),
        statuses(rnd.nextInt(statuses.length)),
        priorities(rnd.nextInt(priorities.length)))
    }
  }

  private def ordersDF(xs: Seq[Ord], parts: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType, nullable = true),
      StructField("o_custkey", LongType, nullable = true),
      StructField("o_totalprice", DoubleType, nullable = true),
      StructField("o_orderstatus", StringType, nullable = true),
      StructField("o_orderpriority", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        xs.map(o => Row(o.okey, o.custkey, o.total, o.status, o.priority)), parts), schema)
  }

  test("ruleReport == conditional-sum reference (null keys violate uniqueness; dangling+null FKs violate ref)") {
    for (seed <- 11L to 18L) {
      val rnd  = new scala.util.Random(seed * 13)
      val xs   = ordersGen(seed)
      val dim  = (0L until 12L).toSeq // unique parent keys; 12..19 dangle
      val dimDF = spark.createDataFrame(
        spark.sparkContext.parallelize(dim.map(Row(_)), 1 + rnd.nextInt(2)),
        StructType(Seq(StructField("c_custkey", LongType, nullable = false))))
      val got = Checks
        .ruleReport(ordersDF(xs, 1 + rnd.nextInt(4)), dimDF, "o_custkey", "o_orderkey", Checks.OrdersRules)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .toSeq
      val n = xs.size.toLong
      val prioRe = java.util.regex.Pattern.compile("^[1-5]-[A-Z ]+$")
      def cnt(p: Ord => Boolean): Long = xs.count(p).toLong
      val expectedMap = Map(
        "unique_o_orderkey" -> (n - xs.map(_.okey).filter(_ != null).distinct.size),
        "complete_custkey"  -> cnt(_.custkey == null),
        "nonneg_totalprice" -> cnt(o => o.total == null || o.total.doubleValue < 0.0),
        "totalprice_cap_100k" -> cnt(o => o.total != null && o.total.doubleValue > 100000.0),
        "status_domain" -> cnt(o => o.status == null || !Set("O", "F", "P").contains(o.status)),
        "priority_format" -> cnt(o => o.priority == null || !prioRe.matcher(o.priority).find),
        "ref_custkey_customer" -> cnt(o => o.custkey == null || !dim.contains(o.custkey.longValue))
      )
      val expected = expectedMap.toSeq.sortBy(_._1).map { case (rule, v) => (rule, n, v, v == 0L) }
      assert(got == expected, s"seed $seed")
    }
  }

  // --- unpivotStats ----------------------------------------------------------

  test("unpivotStats == melt reference (NULL measure values excluded; DECIMAL(28,6) sum strings)") {
    for (seed <- 21L to 28L) {
      val rnd = new scala.util.Random(seed * 17)
      val rows = (0 until 30 + rnd.nextInt(60)).map { _ =>
        (if (rnd.nextInt(5) == 0) null else s"g${rnd.nextInt(3)}",
          if (rnd.nextInt(5) == 0) null else java.lang.Double.valueOf((rnd.nextInt(200000) - 100000) / 100.0),
          if (rnd.nextInt(3) == 0) null else java.lang.Double.valueOf(rnd.nextInt(1000) / 1000.0))
      }
      val schema = StructType(Seq(
        StructField("g", StringType, nullable = true),
        StructField("m1", DoubleType, nullable = true),
        StructField("m2", DoubleType, nullable = true)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (g, a, b) => Row(g, a, b) }, 1 + rnd.nextInt(4)), schema)
      val got = Reshape.unpivotStats(df, "g", Seq("m1", "m2"))
        .collect()
        .map(r => (r.getString(0), Option(r.getString(1)), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getString(5)))
        .toSet
      val long = rows.flatMap { case (g, a, b) =>
        Seq(Option(a).map(v => ("m1", g, v.doubleValue)), Option(b).map(v => ("m2", g, v.doubleValue))).flatten
      }
      val expected = long.groupBy(t => (t._1, Option(t._2))).map { case ((m, g), xs) =>
        val vals = xs.map(_._3)
        val sum  = vals.map(bd(_, 6)).reduce(_ add _).setScale(6)
        (m, g, vals.size.toLong, vals.min, vals.max, sum.toPlainString)
      }.toSet
      assert(got == expected, s"seed $seed")
    }
  }

  // --- orderItemsConsistency -------------------------------------------------

  test("orderItemsConsistency == exact decimal drift reference (headerless orders counted, never summed)") {
    for (seed <- 31L to 38L) {
      val rnd = new scala.util.Random(seed * 19)
      val nOrders = 15 + rnd.nextInt(25)
      val headers = (0 until nOrders).map { i =>
        (i.toLong, (rnd.nextInt(5000000) / 100.0) * (if (rnd.nextInt(10) == 0) 0.0 else 1.0))
      }
      // items reference orders 0..nOrders+3 (some dangling), some orders get none
      val items = (0 until 3 * nOrders).map { _ =>
        (rnd.nextInt(nOrders + 4).toLong,
          rnd.nextInt(1000000) / 100.0,
          rnd.nextInt(11) / 100.0,
          rnd.nextInt(9) / 100.0)
      }
      val oDF = spark.createDataFrame(
        spark.sparkContext.parallelize(headers.map { case (k, t) => Row(k, t) }, 1 + rnd.nextInt(4)),
        StructType(Seq(StructField("o_orderkey", LongType, nullable = false),
          StructField("o_totalprice", DoubleType, nullable = false))))
      val lDF = spark.createDataFrame(
        spark.sparkContext.parallelize(items.map { case (k, p, d, t) => Row(k, p, d, t) }, 1 + rnd.nextInt(4)),
        StructType(Seq(StructField("l_orderkey", LongType, nullable = false),
          StructField("l_extendedprice", DoubleType, nullable = false),
          StructField("l_discount", DoubleType, nullable = false),
          StructField("l_tax", DoubleType, nullable = false))))
      val got = Checks.orderItemsConsistency(oDF, lDF).collect().head
      val one = java.math.BigDecimal.ONE.setScale(2)
      val liTotals: Map[Long, java.math.BigDecimal] = items
        .groupBy(_._1)
        .map { case (k, xs) =>
          k -> xs.map { case (_, p, d, t) =>
            val factor = (one.subtract(bd(d, 2))).multiply(one.add(bd(t, 2))).setScale(4)
            bd(p, 2).multiply(factor) // scale 6
          }.reduce(_ add _)
        }
      val diffs = headers.map { case (k, total) =>
        (bd(total, 2), liTotals.get(k).map(li => bd(total, 2).subtract(li).abs))
      }
      val nNoItems = diffs.count(_._2.isEmpty).toLong
      val nExact   = diffs.count(_._2.exists(_.compareTo(new java.math.BigDecimal("0.01")) < 0)).toLong
      val nWithin = diffs.count { case (h, d) =>
        h.signum != 0 && d.exists(_.doubleValue / h.doubleValue < 0.05)
      }.toLong
      val sumAbs = diffs.flatMap(_._2).reduceOption(_ add _).map(_.setScale(6).toPlainString)
      val expected = (nOrders.toLong, nNoItems, nExact, nWithin, sumAbs)
      val gotT = (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
        Option(got.getString(4)))
      assert(gotT == expected, s"seed $seed")
    }
  }
}
