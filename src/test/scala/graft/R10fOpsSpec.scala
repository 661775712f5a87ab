package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dedup.{DedupClusters, DedupOps}
import graft.stats.BottomKSketch

/** Round-10f operator wave: dedup cluster-size histogram and the bottom-k
  * mergeable quantile sketch.
  */
class R10fOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs     = Tables.load(spark, dir, "documents")
  private lazy val lineitem = Tables.load(spark, dir, "lineitem")

  // --- clusterSizes ---------------------------------------------------------

  test("clusterSizes: docs conserve, sizes reproduce the label multiset") {
    val labels = DedupClusters.dedupClusters(docs)
    val hist = DedupOps.clusterSizes(labels).collect()
    assert(hist.map(_.getLong(2)).sum == labels.count()) // Σ size·count = docs
    hist.foreach(r => assert(r.getLong(2) == r.getLong(0) * r.getLong(1)))
    // cross-check one bucket against a direct computation
    val direct = labels.groupBy("cluster_id").count()
      .groupBy("count").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    hist.foreach(r => assert(direct(r.getLong(0)) == r.getLong(1)))
  }

  // --- BottomKSketch --------------------------------------------------------

  test("sketchQuantiles: mergeable — union of half-sketches equals the whole sketch") {
    val k = 64
    val whole = BottomKSketch
      .bottomKSample(lineitem, Seq("l_orderkey", "l_linenumber"), Seq("l_quantity"), k, "qsk")
      .collect().map(_.getString(1)).toSeq
    val halves = Seq(lineitem.where($"l_orderkey" % 2 === 0), lineitem.where($"l_orderkey" % 2 === 1))
      .flatMap(h => BottomKSketch
        .bottomKSample(h, Seq("l_orderkey", "l_linenumber"), Seq("l_quantity"), k, "qsk")
        .collect().map(_.getString(1)))
      .sorted.take(k)
    assert(whole == halves) // keep-k-smallest over partials ≡ one global pass
  }

  test("sketchQuantiles: estimates land inside the exact neighboring-quantile band") {
    val est = BottomKSketch.sketchQuantiles(
      lineitem, Seq("l_orderkey", "l_linenumber"), Seq("l_extendedprice"),
      Seq(0.5), k = 1024).collect().head.getDouble(2)
    val exact = graft.stats.NumericStats
      .quantiles(lineitem, Seq("l_extendedprice"), Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // a k=1024 uniform sample's median sits well inside [p25, p75]
    assert(est >= exact(0.25) && est <= exact(0.75), s"$est outside [${exact(0.25)}, ${exact(0.75)}]")
  }

  // --- orderItemsConsistency ------------------------------------------------

  test("orderItemsConsistency: formula-clean orders match exactly, orphans counted") {
    val orders = Seq(
      (1L, 216.00),  // 2 items below, formula-consistent
      (2L, 50.00),   // 1 item, off by a lot
      (3L, 10.00)    // no items — orphan
    ).toDF("o_orderkey", "o_totalprice")
    // item charge: 100·(1−0.10)(1+0.20) = 108.00 each → order 1 sums to 216.00
    val lineitem = Seq(
      (1L, 100.0, 0.10, 0.20),
      (1L, 100.0, 0.10, 0.20),
      (2L, 100.0, 0.00, 0.00)
    ).toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    val r = graft.quality.Checks.orderItemsConsistency(orders, lineitem).collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 1) // orders, orphans
    assert(r.getLong(2) == 1 && r.getLong(3) == 1) // exact match, within 5%
    assert(BigDecimal(r.getString(4)) == BigDecimal("50.000000")) // |50−100| drift
  }

  // --- volumeTrend ----------------------------------------------------------

  test("volumeTrend: exact slope algebra on a hand-built linear series") {
    // type 'a': counts 2,4,6 on days 0,1,2 → slope 2 exactly
    val ts = for {
      (day, n) <- Seq((0, 2), (1, 4), (2, 6))
      i <- 0 until n
    } yield (day.toLong * 86400000000L * 1000 + i, "a")
    val events = ts.toDF("nanos", "event_type")
      .select(expr("timestamp_micros(nanos DIV 1000)").as("ts"), $"event_type",
        monotonically_increasing_id().as("event_id"), lit(1L).as("user_id"),
        lit(0.0).as("value"), lit("{}").as("props"))
    val r = graft.analytics.EventOps.volumeTrend(events).collect().head
    assert(r.getLong(1) == 3 && r.getLong(3) == 12)           // m, Σy
    val num = BigDecimal(r.getString(6)); val den = BigDecimal(r.getString(7))
    assert(den != 0 && num / den == BigDecimal(2))            // slope exactly 2
  }

  test("sketchQuantiles: estimates monotone in q, plan is TakeOrdered not a global sort") {
    val df = BottomKSketch.sketchQuantiles(
      lineitem, Seq("l_orderkey", "l_linenumber"), Seq("l_quantity"),
      Seq(0.25, 0.5, 0.75, 0.95))
    val ests = df.collect().sortBy(_.getDouble(1)).map(_.getDouble(2))
    assert(ests.zip(ests.tail).forall { case (a, b) => a <= b })
    val p = BottomKSketch
      .bottomKSample(lineitem, Seq("l_orderkey", "l_linenumber"), Seq("l_quantity"), 1024, "qsk")
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.linesIterator.take(4).mkString("\n"))
  }
}
