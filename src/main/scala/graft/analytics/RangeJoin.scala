package graft.analytics

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bucketized range join — the second classic operator Spark lacks a native
  * plan for (next to [[AsOfJoin]]): join fact rows to OVERLAPPING value
  * intervals. Naively `fact JOIN bands ON v >= lo AND v < hi` plans a
  * BroadcastNestedLoopJoin — every row tests every band, O(|fact|·|bands|),
  * the textbook scale-killer once bands number in the thousands (price
  * grids, time windows, geo tiles). The bucketized shape:
  *
  *   1. quantize: each band explodes to the grid CELLS it covers (tiny —
  *      |bands| × cells-per-band rows); each fact row computes its one cell;
  *   2. broadcast equi-join on the cell (BroadcastHashJoin, hash lookup per
  *      row instead of |bands| comparisons);
  *   3. re-check the exact range — the cell join is a superset.
  *
  * Work per fact row is the number of bands overlapping ITS cell, not
  * |bands|. Grid size trades dim expansion against per-row candidates.
  */
object RangeJoin {

  final case class Band(bandId: Long, lo: Double, hi: Double) {
    require(hi > lo, s"band $bandId empty: [$lo, $hi)")
  }

  /** Fact rows matched to every band whose [lo, hi) contains `valueCol`;
    * output = fact columns + band_id (inner semantics — unmatched rows
    * drop, rows in several bands duplicate, the point of overlap support).
    */
  def joinBands(fact: DataFrame, valueCol: String, bands: Seq[Band], grid: Double): DataFrame = {
    require(bands.nonEmpty && grid > 0, "need bands and a positive grid")
    val spark = fact.sparkSession
    val dimRows = for {
      b    <- bands
      cell <- math.floor(b.lo / grid).toLong to math.floor((b.hi - math.ulp(b.hi)) / grid).toLong
    } yield Row(cell, b.bandId, b.lo, b.hi)
    val dimSchema = StructType(Seq(
      StructField("__cell", LongType, nullable = false),
      StructField("band_id", LongType, nullable = false),
      StructField("__lo", DoubleType, nullable = false),
      StructField("__hi", DoubleType, nullable = false)
    ))
    val dim = spark.createDataFrame(spark.sparkContext.parallelize(dimRows, 1), dimSchema)
    val v = col(valueCol).cast("double")
    fact
      .withColumn("__cell", floor(v / grid).cast("long"))
      .join(broadcast(dim), Seq("__cell"))
      .where(v >= col("__lo") && v < col("__hi"))
      .drop("__cell", "__lo", "__hi")
  }

  /** The declared instance: lineitem prices against DELIBERATELY OVERLAPPING
    * price bands (each interior band half-overlaps its neighbor, so most
    * rows match two bands — the overlap path is what the hash check
    * exercises; disjoint bands would degenerate to a histogram). Aggregated
    * per band: exact count + exact decimal sum (the [[graft.stats
    * .NumericStats]] sum convention).
    */
  val priceBands: Seq[Band] =
    (0 until 10).map(i => Band(i.toLong, i * 10000.0, i * 10000.0 + 15000.0))

  def priceBandStats(lineitem: DataFrame, grid: Double = 5000.0): DataFrame =
    joinBands(graft.Tables.widen(lineitem), "l_extendedprice", priceBands, grid)
      .groupBy(col("band_id"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(28,6)")).cast("decimal(28,6)").cast("string").as("sum_str")
      )
      .orderBy("band_id")

  def oraclePriceBandStats: String = {
    val values = priceBands
      .map(b => s"(${b.bandId}, CAST(${b.lo} AS DOUBLE), CAST(${b.hi} AS DOUBLE))")
      .mkString(",\n    ")
    s"""SELECT b.band_id, count(*) AS n,
       |  CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS VARCHAR) AS sum_str
       |FROM lineitem l JOIN (VALUES
       |    $values) AS b(band_id, lo, hi)
       |  ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
       |GROUP BY b.band_id ORDER BY band_id""".stripMargin
  }
}
