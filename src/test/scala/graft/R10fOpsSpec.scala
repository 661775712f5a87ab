package graft

import org.scalatest.funsuite.AnyFunSuite

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
