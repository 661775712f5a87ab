package graft.stats

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.model.ColumnStats
import graft.pattern.PatternRules

/** Mergeable (incremental) profiling — the shape a 100 TB daily pipeline
  * actually runs: profile each slice (day / partition / ingest batch)
  * INDEPENDENTLY, persist the per-slice partial states, and merge any
  * subset of slices into a table profile without touching the data again.
  *
  * Everything in the partial state is an honest commutative monoid:
  *   - row / non-null / pattern-match counts: longs, merge = sum (exact —
  *     a merged profile's counts and pattern RATIOS are identical to a
  *     full-scan profile's);
  *   - distinct counts: Apache DataSketches HLL sketches
  *     (`hll_sketch_agg` / `hll_union_agg`, built into Spark 4) — merge =
  *     sketch union, estimate within ~2% standard error. Exact distinct is
  *     the one quantity that cannot be merged from independent slices
  *     without carrying the value sets themselves.
  *
  * Sketch input is the value's string rendering (uniform across types,
  * including types HLL does not take natively; consistent with the
  * engine's render-distinct deviation for exotic columns).
  */
object MergeableStats {

  /** Per-slice partial profile: one row per `sliceCol` value carrying every
    * column's mergeable state. Persist this (tiny — one row per slice) next
    * to the data; re-profiling a slice replaces its row.
    *
    * The nn + pattern-match aggregates are [[StatsPass.patternAggsFor]] —
    * StatsPass's OWN construction, not a copy — so the merged profile and
    * the full-scan profile can never disagree on pattern-bank semantics
    * (r11 review); only the HLL sketch column is added here.
    */
  def partials(df: DataFrame, sliceCol: String): DataFrame = {
    val fields = df.schema.fields.toSeq.filter(_.name != sliceCol)
    val aggs: Seq[Column] = count(lit(1)).as("__total") +: fields.zipWithIndex.flatMap {
      case (f, i) =>
        StatsPass.patternAggsFor(f, i, StatsPass.Config()) :+
          expr(s"hll_sketch_agg(CAST(${quoted(f.name)} AS STRING))").as(s"c${i}__hll")
    }
    df.groupBy(col(sliceCol)).agg(aggs.head, aggs.tail: _*)
  }

  private def quoted(name: String): String = s"`${name.replace("`", "``")}`"

  /** Merge any subset of partial rows into per-column [[ColumnStats]]:
    * counts sum exactly, distincts union as sketches. One tiny Spark job
    * over |slices| rows — the data itself is never re-read.
    */
  def merge(partialRows: DataFrame, schema: Seq[String]): Seq[ColumnStats] = {
    val fields = schema.zipWithIndex
    val aggs: Seq[Column] = sum(col("__total")).as("__total") +: fields.flatMap { case (_, i) =>
      Seq(
        sum(col(s"c${i}__nn")).as(s"c${i}__nn"),
        expr(s"hll_sketch_estimate(hll_union_agg(c${i}__hll))").as(s"c${i}__uniq")
      ) ++ PatternRules.measuredPatterns.map { p =>
        sum(col(s"c${i}__${p.key}")).as(s"c${i}__${p.key}")
      }
    }
    val row: Row = partialRows.agg(aggs.head, aggs.tail: _*).collect()(0)
    def get(name: String): Long = {
      val idx = row.fieldIndex(name)
      if (row.isNullAt(idx)) 0L else row.getLong(idx)
    }
    val total = get("__total")
    fields.map { case (name, i) =>
      ColumnStats(
        name = name,
        totalRows = total,
        nonNullCount = get(s"c${i}__nn"),
        uniqueCount = get(s"c${i}__uniq"),
        patternMatches =
          PatternRules.measuredPatterns.map(p => p.key -> get(s"c${i}__${p.key}")).toMap
      )
    }
  }

  /** Declared projection of the slice-and-merge path — the EXACT monoids
    * only (row/non-null/pattern-match counts; the HLL distinct is an
    * estimate and stays spec-tested): slice the table on `sliceCol`,
    * profile each slice independently ([[partials]]), [[merge]] the slice
    * rows, emit the counts. The oracle computes the same counts in ONE full
    * scan, so "independent slice profiles merge to the full-scan profile" —
    * the incremental-pipeline invariant — is itself hash-checked, not just
    * spec-asserted.
    */
  def mergedStatsDF(df: DataFrame, sliceCol: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val spark = df.sparkSession
    val cols  = df.schema.fields.map(_.name).filter(_ != sliceCol).toSeq
    val stats = merge(partials(graft.Tables.widen(df), sliceCol), cols)
    val keys  = PatternRules.measuredPatterns.map(_.key)
    val rows: Seq[Row] = stats.map(s =>
      Row.fromSeq(Seq(s.name, s.totalRows, s.nonNullCount) ++ keys.map(k => s.patternMatches(k))))
    val schema = StructType(
      Seq(
        StructField("column_name", StringType),
        StructField("total_rows", LongType),
        StructField("non_null_count", LongType)
      ) ++ keys.map(k => StructField(s"m_$k", LongType))
    )
    spark.createDataFrame(rows.asJava, schema).orderBy("column_name")
  }

  /** DuckDB twin of [[mergedStatsDF]]: the same counts in one full scan
    * (anchored patterns make partial-match `regexp_matches` ≡ full match,
    * the established OracleGen convention).
    */
  def oracleMergedStats(table: String, cols: Seq[String]): String = {
    val selects = cols.map { c =>
      val matches = PatternRules.measuredPatterns.map(p =>
        s"count(*) FILTER (WHERE regexp_matches(CAST($c AS VARCHAR), '${p.regex.replace("'", "''")}')) AS m_${p.key}")
      (Seq(s"'$c' AS column_name", "count(*) AS total_rows", s"count($c) AS non_null_count") ++ matches)
        .mkString("SELECT ", ", ", s" FROM $table")
    }
    selects.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }
}
