package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.scale.ZOrder

/** Z-order layout: interleave correctness, the locality property that makes
  * data skipping work, and dynamic partition pruning over the partitioned
  * layout.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val lineitem = Tables.load(spark, dir, "lineitem")

  test("zValue: hand-computed Morton interleave") {
    // x=0b101 (bits 0,2), y=0b011 (bits 0,1) → z = 0b010111? compute:
    // x bits at even positions: 1<<0 | 1<<4 = 17; y bits at odd: 1<<1 | 1<<3 = 10 → 27
    val r = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.zValue($"x", $"y", bits = 4).as("z")).collect().head.getLong(0)
    assert(r == 27L)
  }

  test("zValue: bijective on the grid (no two cells collide)") {
    val n = (0 until 16).flatMap(x => (0 until 16).map(y => (x.toLong, y.toLong)))
    val zs = n.toDF("x", "y").select(ZOrder.zValue($"x", $"y", bits = 4)).collect().map(_.getLong(0))
    assert(zs.distinct.length == 256 && zs.min == 0L && zs.max == 255L)
  }

  test("clusterByZ: z-ordered chunks have tighter two-sided ranges than natural order") {
    // proxy for file footers: split each layout into 16 equal row chunks and
    // measure the average (x-range + y-range) a footer would publish
    def avgFooterWidth(df: org.apache.spark.sql.DataFrame): Double = {
      val rows = df.select(pmod($"l_partkey", lit(65536L)), pmod($"l_suppkey", lit(65536L)))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val chunks = rows.grouped(math.max(1, rows.length / 16)).toSeq
      chunks.map { c =>
        val xs = c.map(_._1); val ys = c.map(_._2)
        (xs.max - xs.min).toDouble + (ys.max - ys.min).toDouble
      }.sum / chunks.length
    }
    val natural = avgFooterWidth(lineitem)
    val zed = avgFooterWidth(
      ZOrder.clusterByZ(lineitem, pmod($"l_partkey", lit(65536L)), pmod($"l_suppkey", lit(65536L)),
        numPartitions = 4))
    assert(zed < natural * 0.7, s"z-order footer width $zed !< 0.7 × natural $natural")
  }

  test("partitioned layout enables dynamic partition pruning on a dim-filtered join") {
    val docs = Tables.load(spark, dir, "documents")
    val path = s"/tmp/graft_dpp_spec/${spark.sparkContext.applicationId}/documents"
    docs.write.mode("overwrite").partitionBy("lang").parquet(path)
    val fact = spark.read.parquet(path)
    // the dim must be a scanned relation with a surviving selective Filter —
    // a LocalRelation gets constant-folded and DPP's selectivity check then
    // sees no predicate to prune with
    val dimPath = s"/tmp/graft_dpp_spec/${spark.sparkContext.applicationId}/dim"
    Seq(("en", 1), ("fr", 2)).toDF("lang", "weight").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).where($"weight" === 1)
    val joined = fact.join(dim, Seq("lang"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      plan.linesIterator.take(10).mkString("\n"))
    assert(joined.count() == docs.where($"lang" === "en").count())
  }
}
