package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The dataset datasheet — the one-page "data card" a corpus release ships
  * (Gebru et al., "Datasheets for Datasets"): corpus size, language/source
  * breadth, duplication pressure, quality and language-ID coverage, each a
  * (metric, value) row so downstream tooling diffs cards across releases.
  *
  * This is a COMPOSITION query: every number is one of the declared operator
  * families' own aggregates (token counts, exact-dup groups, MinHash candidate
  * pairs, quality gate, language ID), unioned into one relation and
  * hash-checked end-to-end — the integration is under the oracle, not just
  * the parts.
  *
  * Exactness: counts are longs; the two coverage ratios are single
  * long/long → DOUBLE quotients (the declared-ratio convention). Columns
  * split into value_long (null on ratio rows) and value_ratio (null on count
  * rows) so no column mixes types.
  *
  * Plan shape: a union of 1-row (or near-1-row) aggregates — each leg is its
  * family's own single-scan plan, the union is one job, and the only
  * nontrivial leg (candidate pairs) is the banded LSH join, never all-pairs.
  * At 100 TB the datasheet costs what its most expensive constituent costs;
  * nothing is added on top.
  */
object Datasheet {

  private val nullRatio = lit(null).cast("double")
  private val nullLong  = lit(null).cast("long")

  def datasheet(docs0: DataFrame): DataFrame = {
    val docs = graft.Tables.widen(docs0)
    val toks = docs.select(
      col("lang"),
      col("source"),
      size(regexp_extract_all(col("text"), lit("[^ ]+"), lit(0))).cast("long").as("n")
    )
    val base = toks.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n")).as("n_tokens"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources")
    )
    val counts = base.select(
      array(
        struct(lit("n_docs").as("metric"), col("n_docs").as("value_long"), nullRatio.as("value_ratio")),
        struct(lit("n_tokens").as("metric"), col("n_tokens").as("value_long"), nullRatio.as("value_ratio")),
        struct(lit("n_langs").as("metric"), col("n_langs").as("value_long"), nullRatio.as("value_ratio")),
        struct(lit("n_sources").as("metric"), col("n_sources").as("value_long"), nullRatio.as("value_ratio"))
      ).as("rows")
    ).select(explode(col("rows")).as("r")).select(col("r.*"))

    val dupGroups = graft.dedup.DedupOps
      .exactDuplicates(docs)
      .where(col("n_copies") > 1)
      .agg(count(lit(1)).as("v"))
      .select(lit("exact_dup_groups").as("metric"), col("v").as("value_long"), nullRatio.as("value_ratio"))

    val candPairs = graft.dedup.DedupOps
      .minhashCandidatePairs(docs)
      .agg(count(lit(1)).as("v"))
      .select(lit("minhash_candidate_pairs").as("metric"), col("v").as("value_long"), nullRatio.as("value_ratio"))

    val qual = graft.text.TextOps
      .quality(docs)
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("quality_class") === "good", 1L).otherwise(0L)).as("good")
      )
      .select(
        lit("pct_good_quality").as("metric"),
        nullLong.as("value_long"),
        (col("good").cast("double") / col("n")).as("value_ratio")
      )

    val langCov = graft.text.TextOps
      .langId(docs)
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("pred_lang") =!= "und", 1L).otherwise(0L)).as("idd")
      )
      .select(
        lit("pred_lang_coverage").as("metric"),
        nullLong.as("value_long"),
        (col("idd").cast("double") / col("n")).as("value_ratio")
      )

    counts
      .unionByName(dupGroups)
      .unionByName(candPairs)
      .unionByName(qual)
      .unionByName(langCov)
      .orderBy("metric")
  }

  /** DuckDB twin: the same legs as UNION ALL of the families' own oracle
    * aggregates.
    */
  def oracleDatasheet: String = {
    val q = graft.text.TextOps.oracleQuality.replace("ORDER BY doc_id", "")
    val l = graft.text.TextOps.oracleLangId.replace("ORDER BY doc_id", "")
    s"""WITH toks AS (
       |  SELECT lang, source, CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n
       |  FROM documents),
       |dupg AS (SELECT * FROM (${graft.dedup.DedupOps.oracleExactDuplicates}) WHERE n_copies > 1),
       |cand AS (${graft.dedup.DedupOps.oracleMinhashCandidatePairs}),
       |q AS ($q),
       |l AS ($l)
       |SELECT metric, value_long, value_ratio FROM (
       |  SELECT 'n_docs' AS metric, CAST(count(*) AS BIGINT) AS value_long, CAST(NULL AS DOUBLE) AS value_ratio FROM toks
       |  UNION ALL
       |  SELECT 'n_tokens', CAST(sum(n) AS BIGINT), NULL FROM toks
       |  UNION ALL
       |  SELECT 'n_langs', CAST(count(DISTINCT lang) AS BIGINT), NULL FROM toks
       |  UNION ALL
       |  SELECT 'n_sources', CAST(count(DISTINCT source) AS BIGINT), NULL FROM toks
       |  UNION ALL
       |  SELECT 'exact_dup_groups', CAST(count(*) AS BIGINT), NULL FROM dupg
       |  UNION ALL
       |  SELECT 'minhash_candidate_pairs', CAST(count(*) AS BIGINT), NULL FROM cand
       |  UNION ALL
       |  SELECT 'pct_good_quality', NULL,
       |    CAST(sum(CASE WHEN quality_class = 'good' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) FROM q
       |  UNION ALL
       |  SELECT 'pred_lang_coverage', NULL,
       |    CAST(sum(CASE WHEN pred_lang != 'und' THEN 1 ELSE 0 END) AS DOUBLE) / count(*) FROM l
       |) ORDER BY metric""".stripMargin
  }
}
