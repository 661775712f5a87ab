package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sampling.Sampling

/** Table reconciliation (data diff) — the release-gate comparison between
  * two versions of a dataset: which keys were added, which removed, and per
  * column how many surviving rows changed value. This is what a pipeline
  * runs before promoting a rebuilt corpus over the previous release (did
  * the new cleaning pass touch ONLY what it should have?).
  *
  * Scale shape: one full outer join, both sides shuffled on the key — the
  * irreducible cost of reconciliation (there is no way to decide "removed"
  * without seeing both sides of every key) — followed by a 1-row aggregate
  * of conditional sums unstacked into per-metric rows. All comparisons are
  * null-safe (`<=>` / IS DISTINCT FROM); a value going null IS a change.
  *
  * The summary is deliberately the DECLARED form (O(cols) rows): the
  * row-level drill-down (which keys changed) is the same join filtered
  * instead of aggregated, and at 100 TB one materializes it only for the
  * keys the summary says exist.
  */
object Diff {

  /** Per-metric reconciliation counts between `oldDf` and `newDf` keyed by
    * `keyCol`: rows `added` / `removed` / `identical`, plus one
    * `changed__<col>` row per compared column (both versions present, value
    * differs null-safely). Ordered by metric.
    */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, keyCol: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "diffSummary needs at least one compare column")
    val o = oldDf.select(col(keyCol).as("k") +: lit(1).as("o_present") +: cols.map(c => col(c).as(s"o_$c")): _*)
    val n = newDf.select(col(keyCol).as("k") +: lit(1).as("n_present") +: cols.map(c => col(c).as(s"n_$c")): _*)
    val j = o.join(n, Seq("k"), "full_outer")
    val both = col("o_present").isNotNull && col("n_present").isNotNull
    val allSame = cols.map(c => col(s"o_$c") <=> col(s"n_$c")).reduce(_ && _)
    val aggs =
      sum(when(col("o_present").isNull, 1L).otherwise(0L)).as("added") +:
        sum(when(col("n_present").isNull, 1L).otherwise(0L)).as("removed") +:
        sum(when(both && allSame, 1L).otherwise(0L)).as("identical") +:
        cols.map(c =>
          sum(when(both && !(col(s"o_$c") <=> col(s"n_$c")), 1L).otherwise(0L)).as(s"changed__$c"))
    val metrics = Seq("added", "removed", "identical") ++ cols.map(c => s"changed__$c")
    val stackArgs = metrics.map(m => s"'$m', `$m`").mkString(", ")
    j.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${metrics.size}, $stackArgs) AS (metric, n)")
      .orderBy("metric")
  }

  // --- the declared v2 corpus ------------------------------------------------

  /** Fractions/salts of the declared v2 mutation: ~10% of texts edited, ~3%
    * of keys dropped, ~2% re-added under shifted keys. Deterministic on both
    * engines via the md5 hash gate ([[Sampling.gate]]).
    */
  val EditFraction = 0.10
  val DropFraction = 0.03
  val AddFraction  = 0.02
  val KeyShift     = 1000000L
  val EditMarker   = " rev2"

  /** The "next release" of the documents corpus the declared diff compares
    * against: a gated ~10% of texts edited (a deterministic revision-marker
    * append — `changed__text`), a gated ~3% of keys dropped (`removed`),
    * and a gated ~2% duplicated under shifted keys (`added`) — every
    * mutation class non-zero by construction, independently gated so the
    * classes overlap the way real releases do.
    */
  def documentsV2(docs: DataFrame): DataFrame = {
    val edited = docs.select(
      col("doc_id"),
      when(
        Sampling.gate(col("doc_id"), "diffedit") < Sampling.threshold(EditFraction),
        concat(col("text"), lit(EditMarker))
      ).otherwise(col("text")).as("text"),
      col("lang"), col("source"), col("n_chars")
    )
    val kept = edited.where(
      Sampling.gate(col("doc_id"), "diffdrop") >= Sampling.threshold(DropFraction))
    val added = edited
      .where(Sampling.gate(col("doc_id"), "diffadd") < Sampling.threshold(AddFraction))
      .withColumn("doc_id", col("doc_id") + KeyShift)
    kept.unionByName(added)
  }

  /** The declared diff: documents vs [[documentsV2]] over every non-key
    * column.
    */
  def diffDocuments(docs: DataFrame): DataFrame =
    diffSummary(docs, documentsV2(docs), "doc_id", Seq("text", "lang", "source", "n_chars"))

  /** DuckDB twin of [[diffDocuments]] — same v2 construction (redaction
    * chain, gates, key shift), same null-safe comparisons.
    */
  def oracleDiffDocuments: String = {
    val red =
      s"""CASE WHEN ${Sampling.oracleGate("doc_id", "diffedit")} < ${Sampling.threshold(EditFraction)}
         | THEN text || '$EditMarker' ELSE text END""".stripMargin.replace("\n", "")
    val cols = Seq("text", "lang", "source", "n_chars")
    val sums = cols
      .map(c =>
        s"CAST(sum(CASE WHEN o_present IS NOT NULL AND n_present IS NOT NULL AND (o.o_$c IS DISTINCT FROM n.n_$c) THEN 1 ELSE 0 END) AS BIGINT) AS changed__$c")
      .mkString(",\n    ")
    val allSame = cols.map(c => s"(o.o_$c IS NOT DISTINCT FROM n.n_$c)").mkString(" AND ")
    val arms = (Seq("added", "removed", "identical") ++ cols.map(c => s"changed__$c"))
      .map(m => s"SELECT '$m' AS metric, $m AS n FROM a")
      .mkString("\n  UNION ALL ")
    s"""WITH v2 AS (
       |  SELECT doc_id, $red AS text, lang, source, n_chars FROM documents
       |  WHERE ${Sampling.oracleGate("doc_id", "diffdrop")} >= ${Sampling.threshold(DropFraction)}
       |  UNION ALL
       |  SELECT doc_id + $KeyShift, $red, lang, source, n_chars FROM documents
       |  WHERE ${Sampling.oracleGate("doc_id", "diffadd")} < ${Sampling.threshold(AddFraction)}),
       |o AS (SELECT doc_id AS k, 1 AS o_present, ${cols.map(c => s"$c AS o_$c").mkString(", ")} FROM documents),
       |n AS (SELECT doc_id AS k, 1 AS n_present, ${cols.map(c => s"$c AS n_$c").mkString(", ")} FROM v2),
       |a AS (
       |  SELECT
       |    CAST(sum(CASE WHEN o_present IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS added,
       |    CAST(sum(CASE WHEN n_present IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS removed,
       |    CAST(sum(CASE WHEN o_present IS NOT NULL AND n_present IS NOT NULL AND $allSame THEN 1 ELSE 0 END) AS BIGINT) AS identical,
       |    $sums
       |  FROM o FULL OUTER JOIN n USING (k))
       |SELECT metric, n FROM ($arms) ORDER BY metric""".stripMargin
  }
}
