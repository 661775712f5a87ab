package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-column data-skipping layout
  * lever: interleave the bits of two sort keys so rows close on EITHER key
  * land close in the one-dimensional file order, and every file's min/max
  * footer covers a tight range of BOTH columns. A table laid out this way
  * skips files for predicates on either column — the property a single-key
  * sort gives only its leading column. (Public recipe: Delta/Iceberg
  * OPTIMIZE ZORDER; the curve is plain Morton interleaving.)
  *
  * Everything here is exact integer bit arithmetic on pre-bounded inputs —
  * `x % 2^bits` is the caller's normalization contract (rank- or min-max-
  * normalize upstream when the domain is unbounded) — so the z-value is
  * engine-portable and the declared histogram hash-checks in DuckDB with
  * the identical shift/mask expression.
  */
object ZOrder {

  /** Morton-interleave two bounded longs (each in [0, 2^bits)): bit i of x
    * lands at position 2i, bit i of y at 2i+1. Built as a fold of
    * shiftright/and/shiftleft built-ins — 4·bits codegen'd integer ops per
    * row, no UDF.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31] (got $bits)")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The identical interleave as DuckDB SQL over expressions `x`, `y`. */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits)
      .flatMap(i => Seq(s"((($x >> $i) & 1) << ${2 * i})", s"((($y >> $i) & 1) << ${2 * i + 1})"))
      .mkString(" | ")

  /** Re-layout `df` along the z-curve of two bounded key expressions:
    * range-partition on the z-value (so files tile the curve) and sort
    * within partitions (so row groups tile it too). This is the write-side
    * operator; the payoff is read-side file/row-group skipping on either
    * key's min/max stats.
    */
  def clusterByZ(df: DataFrame, x: Column, y: Column, bits: Int = 16, numPartitions: Int = 0): DataFrame = {
    val withZ = df.withColumn("__z", zValue(x, y, bits))
    val parted =
      if (numPartitions > 0) withZ.repartitionByRange(numPartitions, col("__z"))
      else withZ.repartitionByRange(col("__z"))
    parted.sortWithinPartitions(col("__z")).drop("__z")
  }

  /** Declared z-cell histogram: bucket rows by the top `cellBits` bits of
    * the z-value and report per cell the row count and the min/max of BOTH
    * keys — exactly the per-file footer stats a z-ordered layout would
    * publish, demonstrating the tight two-sided ranges that make skipping
    * work. One map-side-combinable aggregate on ≤2^cellBits keys.
    */
  def zCellStats(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = 16,
      cellBits: Int = 6
  ): DataFrame = {
    require(cellBits >= 1 && cellBits <= 2 * bits, "cellBits out of range")
    val x = pmod(col(xCol).cast("long"), lit(1L << bits))
    val y = pmod(col(yCol).cast("long"), lit(1L << bits))
    val cell = shiftright(zValue(x, y, bits), 2 * bits - cellBits)
    graft.Tables.widen(df)
      .select(cell.as("cell"), x.as("x"), y.as("y"))
      .groupBy("cell")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y")
      )
      .orderBy("cell")
  }

  /** DuckDB twin of [[zCellStats]]. */
  def oracleZCellStats(
      table: String,
      xCol: String,
      yCol: String,
      bits: Int = 16,
      cellBits: Int = 6
  ): String = {
    val m = 1L << bits
    val z = zValueSql("x", "y", bits)
    s"""WITH b AS (
       |  SELECT $xCol % $m AS x, $yCol % $m AS y FROM $table),
       |z AS (SELECT ($z) >> ${2 * bits - cellBits} AS cell, x, y FROM b)
       |SELECT cell, count(*) AS n_rows,
       |  CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
       |  CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
       |FROM z GROUP BY cell ORDER BY cell""".stripMargin
  }
}
