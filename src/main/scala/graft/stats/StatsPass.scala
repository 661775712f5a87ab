package graft.stats

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StructField}

import graft.model.ColumnStats
import graft.pattern.PatternRules

import scala.util.{Failure, Success, Try}

/** The distributed measurement layer of the profiler.
  *
  * The reference profiles column-at-a-time with a sequential pandas loop
  * (`pattern_classifier.py:116-123`); the Spark-native inversion computes all
  * per-column measurements as ONE multi-aggregate pass over the table: a
  * single `Aggregate` node (partial per-partition aggregation → 1-row
  * exchange → final aggregation, whole-stage codegen), so 100 TB are scanned
  * once, no data rows ever reach the driver — only one row of aggregate
  * buffers.
  *
  * Per column we measure: non-null count, distinct count, and for each of the
  * anchored regexes in [[PatternRules.measuredPatterns]] the number of
  * matching non-null stringified values. All counts are exact longs; the
  * decision cascade derives ratios deterministically.
  *
  * Scale note (exact vs approx distinct): many exact `count(DISTINCT c)`
  * aggregates in one pass plan through `Expand` (one projection per distinct
  * column — a (C+1)× row blow-up before partial aggregation). Fine at
  * benchmark scale; at the 100 TB design point set `exactDistinct = false`
  * to use `approx_count_distinct` (HyperLogLog++, no Expand, single pass).
  * Exact mode is the default because the DuckDB oracle hash-checks distinct
  * counts.
  */
object StatsPass {

  final case class Config(
      exactDistinct: Boolean = true,
      /** relative accuracy for approx_count_distinct when exactDistinct=false */
      approxRsd: Double = 0.01,
      /** collect first-K sample values (extra bounded scan); oracle-excluded */
      withSamples: Boolean = false,
      sampleK: Int = 5,
      /** rows scanned (from the head of the table) for the sample capture */
      sampleScanRows: Int = 1000
  )

  /** Measure every column of `df` in one aggregate pass.
    *
    * Columns whose aggregate expressions fail to build are skipped (the
    * reference's per-column error isolation, `pattern_classifier.py:117-123`);
    * the returned seq preserves `df.columns` order for the surviving columns.
    */
  def compute(df: DataFrame, config: Config = Config()): Seq[ColumnStats] = {
    val fields: Seq[StructField] = df.schema.fields.toSeq
    if (fields.isEmpty) return Seq.empty

    // Build the aggregate bundle per column; Try isolates bad columns
    // (per-column error isolation, `pattern_classifier.py:117-123`). The
    // positional index i keys the aliases so arbitrary column names never
    // collide with alias syntax.
    val perColumn: Seq[(StructField, Int, Seq[Column])] =
      fields.zipWithIndex.flatMap { case (f, i) =>
        Try(aggsFor(f, i, config)) match {
          case Success(aggs) => Some((f, i, aggs))
          case Failure(_)    => None
        }
      }
    if (perColumn.isEmpty) return Seq.empty

    val aggExprs: Seq[Column] = count(lit(1)).as("__total") +: perColumn.flatMap(_._3)
    val row: Row = df.agg(aggExprs.head, aggExprs.tail: _*).collect()(0)

    val total = row.getAs[Long]("__total")
    val patternKeys = PatternRules.measuredPatterns.map(_.key)

    val samples: Map[String, Seq[String]] =
      if (config.withSamples) sampleValues(df, perColumn.map(_._1.name), config)
      else Map.empty

    perColumn.map { case (f, i, _) =>
      val nn   = row.getAs[Long](s"c${i}__nn")
      // sum(when) on an empty/all-null column yields null; treat as 0.
      val uniq = row.getAs[Long](s"c${i}__uniq")
      val matches = patternKeys.map { k =>
        val idx = row.fieldIndex(s"c${i}__$k")
        k -> (if (row.isNullAt(idx)) 0L else row.getLong(idx))
      }.toMap
      ColumnStats(
        name = f.name,
        totalRows = total,
        nonNullCount = nn,
        uniqueCount = uniq,
        patternMatches = matches,
        sampleValues = samples.getOrElse(f.name, Seq.empty)
      )
    }
  }

  /** Aggregate expressions for one column, aliased by position (`c{i}__*`). */
  private def aggsFor(f: StructField, i: Int, config: Config): Seq[Column] = {
    val raw = col(s"`${f.name.replace("`", "``")}`")
    val s   = raw.cast("string")
    // MapType is not comparable/hashable in Spark aggregates; distinct-count
    // its string rendering instead (documented deviation for exotic columns).
    val distinctTarget = f.dataType match {
      case _: MapType => s
      case _          => raw
    }
    val nn = count(raw).as(s"c${i}__nn")
    val uniq =
      if (config.exactDistinct) count_distinct(distinctTarget).as(s"c${i}__uniq")
      else approx_count_distinct(distinctTarget, config.approxRsd).as(s"c${i}__uniq")
    val matches = PatternRules.measuredPatterns.map { p =>
      sum(when(s.rlike(p.regex), 1L).otherwise(0L)).as(s"c${i}__${p.key}")
    }
    nn +: uniq +: matches
  }

  /** First-K non-null stringified values per column in stable (file) order,
    * captured from a bounded head scan. Reported for inspection only —
    * excluded from oracle hashes (SURVEY.md §2.1 S3: the reference's
    * "first 5 of a seeded shuffle" is not portable; we declare first-K in
    * table order instead).
    */
  private def sampleValues(
      df: DataFrame,
      names: Seq[String],
      config: Config
  ): Map[String, Seq[String]] = {
    val head = df.limit(config.sampleScanRows)
    val aggs = names.zipWithIndex.map { case (n, i) =>
      val s = col(s"`${n.replace("`", "``")}`").cast("string")
      slice(collect_list(s), 1, config.sampleK).as(s"s$i")
    }
    val row = head.agg(aggs.head, aggs.tail: _*).collect()(0)
    names.zipWithIndex.map { case (n, i) =>
      n -> row.getSeq[String](row.fieldIndex(s"s$i")).toSeq
    }.toMap
  }
}
