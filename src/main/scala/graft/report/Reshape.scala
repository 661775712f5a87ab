package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wide→long reshape (unpivot/melt) — the inverse of the declared pivot
  * (`text/TextOps.langPivot`): turn measure COLUMNS into (measure, value)
  * ROWS. The long form is what generic per-measure pipelines (drift
  * monitors, rule engines, plotting layers) consume without knowing the
  * schema.
  *
  * Spark's native `Dataset.unpivot` plans this as ONE Expand node —
  * each input row fans out to |measures| rows in the same stage, no
  * shuffle, no self-union of N scans (the naive melt). The cost model to
  * know: Expand multiplies ROWS (rows × |measures| through the downstream
  * shuffle), while the agg-then-stack form ([[graft.stats.NumericStats
  * .numericStats]]) aggregates FIRST and stacks 1 row — when the downstream
  * is a global per-measure aggregate, prefer agg-then-stack; melt-then-group
  * earns its Expand only when the aggregate is keyed by row attributes (the
  * grouped form here) or the long rows themselves are the product.
  */
object Reshape {

  /** Long-form grouped envelope: unpivot the measure columns, then per
    * (measure, group) emit count / min / max / exact decimal sum. The
    * declared query `unpivot_lineitem` groups lineitem's four measures by
    * `l_returnflag` — 12 rows out of a 6M×4 Expand at sf1, with the
    * groupBy's map-side combine collapsing each partition to ≤12 partials
    * before the exchange.
    *
    * Sums follow the repo's decimal-string convention
    * (`NumericStats.scala:22`): DECIMAL(28,6) accumulation, declared as the
    * fixed-scale string rendering.
    */
  def unpivotStats(df: DataFrame, groupCol: String, measures: Seq[String]): DataFrame = {
    require(measures.nonEmpty, "unpivotStats needs at least one measure")
    // no widen() (r19): unpivot is a zero-compute row expansion whose
    // partial aggregate collapses to |measures × groups| rows before the
    // exchange — cheaper than round-robin-shuffling every input row first
    df
      .unpivot(
        ids = Array(col(groupCol)),
        values = measures.map(col).toArray,
        variableColumnName = "measure",
        valueColumnName = "val"
      )
      // SQL-standard UNPIVOT semantics (EXCLUDE NULLS): Spark's unpivot
      // keeps NULL measure values where DuckDB's drops them, so a row whose
      // measures are all NULL would manufacture spurious empty groups on
      // the Spark side only (r11 adversarial sweep)
      .where(col("val").isNotNull)
      .groupBy(col("measure"), col(groupCol))
      .agg(
        count(col("val")).as("n_v"),
        min(col("val")).cast("double").as("min_v"),
        max(col("val")).cast("double").as("max_v"),
        sum(col("val").cast("decimal(28,6)")).cast("decimal(28,6)").cast("string").as("sum_str")
      )
      .orderBy("measure", groupCol)
  }

  /** DuckDB twin of [[unpivotStats]] via UNPIVOT (DuckDB's native melt),
    * same grouped envelope on top.
    */
  def oracleUnpivotStats(table: String, groupCol: String, measures: Seq[String]): String =
    s"""SELECT measure, $groupCol, count(val) AS n_v,
       |  CAST(min(val) AS DOUBLE) AS min_v, CAST(max(val) AS DOUBLE) AS max_v,
       |  CAST(CAST(sum(CAST(val AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS VARCHAR) AS sum_str
       |FROM (
       |  UNPIVOT (SELECT $groupCol, ${measures.mkString(", ")} FROM $table)
       |  ON ${measures.mkString(", ")} INTO NAME measure VALUE val)
       |GROUP BY measure, $groupCol
       |ORDER BY measure, $groupCol""".stripMargin
}
