package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Numeric column profiling — the measure-column envelope (count / min /
  * max / exact sum) and fixed-width histograms that classical profilers
  * emit alongside the type/PII classification (reference S1 scope extended
  * to numeric semantics; SURVEY §2.6 "aggregation" row).
  *
  * One scan computes every column's envelope (multi-aggregate, map-side
  * partial, 1-row exchange — same shape as StatsPass job set A); the
  * `stack` pivot to one-row-per-column happens after aggregation, so it
  * costs nothing. Histograms are a groupBy on an integer bucket key —
  * map-side combinable, exchange carries |buckets| rows.
  *
  * Cross-engine canonicalization (the declared contract):
  *  - counts are exact longs;
  *  - min/max are INPUT values cast to double (bit-exact in both engines —
  *    no arithmetic is performed on them; integral inputs here are far
  *    under 2⁵³);
  *  - sums go through DECIMAL(28,6) and are DECLARED as the decimal's
  *    fixed-scale string rendering. Float summation is order-dependent
  *    (forbidden by the repo convention) and decimal→double conversion can
  *    differ by 1 ulp between engines at large magnitudes, which the
  *    bit-exact float compare would catch — the string rendering of the
  *    exact decimal is deterministic on both engines (the DataVault
  *    hashdiff pattern, `DataVault.scala:121`). The testdata's doubles are
  *    ≤6-decimal, so the decimal cast is exact;
  *  - histogram buckets are `floor(x / width)` — identical IEEE division
  *    and floor on identical inputs, compared as exact longs.
  */
object NumericStats {

  /** Per-column numeric envelope over a single scan:
    * (column_name, n_nonnull, min_v, max_v, sum_str), ordered by column.
    */
  def numericStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numericStats needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        sum(col(c).cast("decimal(28,6)")).cast("decimal(28,6)").cast("string").as(s"${c}__sum")
      )
    }
    val agged = graft.Tables.widen(df).agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', `${c}__n`, `${c}__min`, `${c}__max`, `${c}__sum`")
      .mkString(", ")
    agged
      .selectExpr(s"stack(${cols.size}, $stackArgs) AS (column_name, n_nonnull, min_v, max_v, sum_str)")
      .orderBy("column_name")
  }

  def oracleNumericStats(table: String, cols: Seq[String]): String =
    cols
      .map { c =>
        s"""SELECT '$c' AS column_name, count($c) AS n_nonnull,
           |  CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v,
           |  CAST(CAST(sum(CAST($c AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS VARCHAR) AS sum_str
           |FROM $table""".stripMargin
      }
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")

  /** Fixed-width histogram of a numeric column: bucket i covers
    * [i·width, (i+1)·width). Fixed (not data-derived) bounds keep the query
    * one scan and the bucketing portable; nulls are excluded on both sides.
    */
  def histogram(df: DataFrame, c: String, width: Double): DataFrame = {
    require(width > 0, s"width must be positive (got $width)")
    graft.Tables.widen(df)
      .where(col(c).isNotNull)
      .groupBy(floor(col(c).cast("double") / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  def oracleHistogram(table: String, c: String, width: Double): String =
    s"""SELECT CAST(floor(CAST($c AS DOUBLE) / $width) AS BIGINT) AS bucket, count(*) AS n
       |FROM $table WHERE $c IS NOT NULL
       |GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Exact linear-interpolation quantiles for several columns in one scan:
    * (column_name, q_r, value_r). Spark's `percentile` and DuckDB's
    * `quantile_cont` share the (n−1)·q interpolation convention, so on the
    * same values the results agree (both rounded to 6 as the usual float
    * canonicalization). EXACT quantiles buffer the column per aggregate at
    * scale — the declared form is for the profiling tier; at 100 TB use
    * `approx_percentile` (t-digest, not engine-portable, hence not
    * declared).
    */
  def quantiles(df: DataFrame, cols: Seq[String], qs: Seq[Double]): DataFrame = {
    require(cols.nonEmpty && qs.nonEmpty, "quantiles needs columns and probabilities")
    // one ARRAY-form percentile per column: the aggregate buffers each
    // column once for all probabilities (the scalar form would buffer it
    // once PER probability — measured 4× slower at 4 quantiles)
    val aggs = cols.map { c =>
      expr(s"percentile(`$c`, array(${qs.mkString(", ")}))").as(s"${c}__qs")
    }
    val agged = graft.Tables.widen(df).agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .flatMap(c =>
        qs.zipWithIndex.map { case (q, i) => s"'$c', ${q}d, round(element_at(`${c}__qs`, ${i + 1}), 6)" }
      )
      .mkString(", ")
    agged
      .selectExpr(s"stack(${cols.size * qs.size}, $stackArgs) AS (column_name, q_r, value_r)")
      .orderBy("column_name", "q_r")
  }

  def oracleQuantiles(table: String, cols: Seq[String], qs: Seq[Double]): String =
    cols
      .flatMap { c =>
        qs.map { q =>
          s"""SELECT '$c' AS column_name, CAST($q AS DOUBLE) AS q_r,
             |  round(quantile_cont(CAST($c AS DOUBLE), $q), 6) AS value_r
             |FROM $table""".stripMargin
        }
      }
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name, q_r")
}
