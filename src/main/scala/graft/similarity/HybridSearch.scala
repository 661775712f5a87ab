package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval by reciprocal-rank fusion (Cormack et al. 2009): merge a
  * lexical BM25 top-k list and a dense-vector cosine top-k list into one
  * ranking, RRF(d) = Σ_lists 1/(c + rank_list(d)). The modern two-tower
  * retrieval stack in one relation — each tier catches what the other
  * misses (exact term matches vs paraphrase), and the fusion needs no score
  * calibration because it only consumes RANKS.
  *
  * EXACT integer fusion: contributions are floor(10⁹/(c + rank)) summed as
  * longs (`rrf_e9`), so cross-engine float drift is impossible. A document
  * absent from a list contributes 0 and reports rank 0 — both sides
  * coalesce identically. Docs and embeddings join on the shared id space
  * (vec_id ≡ doc_id for the declared tables; rows outside the overlap
  * simply carry one list's contribution).
  *
  * Scale shape: both input lists are k-row relations produced by their own
  * scale-correct generators ([[graft.text.TextOps.bm25]]: one corpus scan +
  * broadcast df table + global top-k; [[SimilarityOps.cosineTopK]]: one
  * scan per query against broadcast query vectors). The fusion itself is a
  * full-outer join of two ≤k-row frames — driver-scale, no corpus touch.
  * The rank window over the 20-row BM25 list is a single-partition window
  * over k rows, not a corpus window.
  */
object HybridSearch {

  private val RrfScale = 1000000000L // 10^9

  /** (doc_id, bm25_rank, ann_rank, rrf_e9), best fused score first. */
  def rrfHybrid(
      docs: DataFrame,
      emb: DataFrame,
      queryTokens: Seq[String],
      queryVecId: Long = 0L,
      k: Int = 20,
      c: Int = 60
  ): DataFrame = {
    val bm25 = graft.text.TextOps.bm25(docs, queryTokens, k)
      // bounded-global-window: bm25() already cut to its top-k (TakeOrdered
      // upstream), so this ranking window sees ≤ k rows — WindowExec's
      // single-partition WARN is expected and harmless here.
      .withColumn("bm25_rank",
        row_number().over(Window.orderBy(col("score_r").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("bm25_rank"))
    val ann = SimilarityOps.cosineTopK(emb, Seq(queryVecId), k)
      .select(col("vec_id").as("doc_id"), col("rank").as("ann_rank"))
    bm25
      .join(ann, Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        coalesce(col("bm25_rank"), lit(0L)).as("bm25_rank"),
        coalesce(col("ann_rank"), lit(0L)).as("ann_rank"),
        (coalesce(expr(s"$RrfScale div ($c + bm25_rank)"), lit(0L)) +
          coalesce(expr(s"$RrfScale div ($c + ann_rank)"), lit(0L))).as("rrf_e9"))
      .orderBy(col("rrf_e9").desc, col("doc_id"))
  }

  /** DuckDB twin of [[rrfHybrid]] — wraps the two tiers' own oracles as CTEs
    * (rank re-derived with the identical (score desc, doc_id) order) and
    * fuses with the same integer floor terms.
    */
  def oracleRrfHybrid(
      bm25Sql: String,
      cosineSql: String,
      c: Int = 60
  ): String =
    s"""WITH b AS (
       |$bm25Sql
       |),
       |br AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score_r DESC, doc_id) AS bm25_rank FROM b),
       |a AS (
       |$cosineSql
       |),
       |ar AS (SELECT vec_id AS doc_id, rank AS ann_rank FROM a),
       |f AS (
       |  SELECT coalesce(br.doc_id, ar.doc_id) AS doc_id, br.bm25_rank, ar.ann_rank
       |  FROM br FULL OUTER JOIN ar ON br.doc_id = ar.doc_id)
       |SELECT doc_id,
       |  CAST(coalesce(bm25_rank, 0) AS BIGINT) AS bm25_rank,
       |  CAST(coalesce(ann_rank, 0) AS BIGINT) AS ann_rank,
       |  CAST(coalesce($RrfScale // ($c + bm25_rank), 0) +
       |       coalesce($RrfScale // ($c + ann_rank), 0) AS BIGINT) AS rrf_e9
       |FROM f ORDER BY rrf_e9 DESC, doc_id""".stripMargin
}
