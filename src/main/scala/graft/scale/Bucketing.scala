package graft.scale

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table co-location — the storage-layout answer to "this join
  * runs every night; why does it shuffle every night?". Writing both fact
  * tables bucketed (and sorted) by the join key lets every subsequent
  * join/aggregate on that key run with ZERO exchange: Spark's V1 bucketed
  * scan reports `HashPartitioning(key, nBuckets)` as its output
  * partitioning, the SortMergeJoin's distribution requirement is already
  * met, and at 100 TB the nightly pipeline pays the shuffle ONCE at write
  * time instead of on every read. Bucket pruning is the same contract in
  * the other direction: an equality predicate on the bucket key scans 1 of
  * N buckets (`SelectedBucketsCount` in the plan), a 1/N IO cut with no
  * index structure.
  *
  * The declared query writes lineitem and orders bucketed by their order
  * key into a scratch warehouse path, reads them back through the catalog,
  * and runs the priority revenue report over the co-located join — the
  * result is oracled against the plain parquet join (bucketing is a layout
  * choice, never a semantics choice). Plan shape (exchange-free join,
  * 1-of-N pruned scan) is asserted in the spec with broadcast disabled.
  *
  * Money convention as `olap/Reporting.scala`: DECIMAL(19,2) inputs,
  * DECIMAL(38,4) products, string-rendered sums.
  */
object Bucketing {

  val DefaultBuckets = 8

  /** Idempotent per-(session, dir): the bucketed write happens once per JVM
    * run, later calls reuse the catalog tables (the "write once, join
    * shuffle-free forever" deployment shape in miniature).
    */
  def ensureBucketedTables(spark: SparkSession, dir: String, nBuckets: Int = DefaultBuckets)
      : (String, String) = {
    val suffix =
      (spark.sparkContext.applicationId + "_" + dir).replaceAll("[^a-zA-Z0-9_]", "_").toLowerCase(java.util.Locale.ROOT)
    val liTable  = s"graft_bkt_lineitem_$suffix"
    val ordTable = s"graft_bkt_orders_$suffix"
    val base     = s"/tmp/graft_bucketed/$suffix"
    if (!spark.catalog.tableExists(liTable)) {
      graft.Tables.load(spark, dir, "lineitem").write
        .bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/lineitem").mode("overwrite").saveAsTable(liTable)
    }
    if (!spark.catalog.tableExists(ordTable)) {
      graft.Tables.load(spark, dir, "orders").write
        .bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$base/orders").mode("overwrite").saveAsTable(ordTable)
    }
    (liTable, ordTable)
  }

  private def revenueTerm =
    col("l_extendedprice").cast("decimal(19,2)") *
      (lit(1).cast("decimal(19,2)") - col("l_discount").cast("decimal(19,2)")).cast("decimal(19,2)")

  /** Priority revenue report over the co-located bucketed join. */
  def bucketedJoinRevenue(spark: SparkSession, dir: String, nBuckets: Int = DefaultBuckets)
      : DataFrame = {
    val (liTable, ordTable) = ensureBucketedTables(spark, dir, nBuckets)
    spark.table(liTable)
      .join(spark.table(ordTable), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(revenueTerm).cast("decimal(38,4)").cast("string").as("revenue_str")
      )
      .orderBy("o_orderpriority")
  }

  /** DuckDB twin over the plain parquet tables — bucketing must not change
    * a single output bit.
    */
  def oracleBucketedJoinRevenue: String =
    """SELECT o_orderpriority, count(*) AS n_items,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(19,2)) *
      |    CAST(1 - CAST(l_discount AS DECIMAL(19,2)) AS DECIMAL(19,2))) AS DECIMAL(38,4))
      |    AS VARCHAR) AS revenue_str
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
}
