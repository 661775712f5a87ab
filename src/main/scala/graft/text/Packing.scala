package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing: group documents into training sequences whose combined
  * token count stays under a budget — the step between a curated corpus and
  * a tokenized training run (padding waste is the cost of NOT packing;
  * dense packing is why pipelines bother).
  *
  * Exact bin packing is NP-hard and inherently sequential; the scalable
  * form is greedy next-fit WITHIN partitions: each partition packs its own
  * documents in (deterministic) doc_id order, emitting `(pack_id, doc_id,
  * n_tokens, seq_pos)` with pack ids namespaced by partition id — no
  * cross-partition coordination, embarrassingly parallel, and the waste vs
  * optimal is bounded (next-fit ≤ 2× optimal bins; in practice far less on
  * mixed-length corpora). Because the result depends on the partitioning,
  * this is a LIBRARY operator (spec-asserted invariants), not a declared
  * oracle query — there is no partition-independent ground truth to hash.
  *
  * Documents longer than the budget get a singleton pack (the caller
  * decides whether to truncate or split upstream); empty docs pack as
  * zero-token members.
  */
object Packing {

  final case class PackedDoc(packId: Long, docId: Long, nTokens: Long, seqPos: Int)

  /** Pack by whitespace-token count under `maxTokens` per sequence. */
  def packSequences(docs: DataFrame, maxTokens: Long = 2048L): Dataset[PackedDoc] = {
    require(maxTokens > 0, s"maxTokens must be positive (got $maxTokens)")
    val spark = docs.sparkSession
    import spark.implicits._
    graft.Tables.widen(docs)
      .select(
        col("doc_id").cast("long"),
        size(expr("filter(split(lower(text), ' '), t -> t != '')")).cast("long").as("n_tokens")
      )
      .as[(Long, Long)]
      // deterministic intra-partition order → deterministic packing per split
      .sortWithinPartitions("doc_id")
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        var packSeq = 0L
        var used    = 0L
        var pos     = 0
        var started = false
        it.map { case (docId, n) =>
          if (!started || used + n > maxTokens) {
            if (started) packSeq += 1
            used = 0L
            pos = 0
            started = true
          }
          used += n
          val out = PackedDoc(pid << 32 | packSeq, docId, n, pos)
          pos += 1
          out
        }
      }
  }

  /** Packing efficiency: fraction of the total pack capacity actually
    * filled by tokens (excluding over-budget singleton packs, which are
    * unpackable by definition).
    */
  def packingEfficiency(packed: Dataset[PackedDoc], maxTokens: Long): Double = {
    val byPack = packed.toDF()
      .groupBy("packId")
      .agg(sum("nTokens").as("toks"))
      .where(col("toks") <= maxTokens)
    val row = byPack.agg(sum("toks").as("filled"), count(lit(1)).as("packs")).first()
    val packs = row.getAs[Long]("packs")
    // degenerate corpora (empty, or every doc over budget) have no packable
    // sequence — efficiency is 0 by definition, not a division by zero
    if (packs == 0L || row.isNullAt(row.fieldIndex("filled"))) 0.0
    else row.getAs[Long]("filled").toDouble / (packs * maxTokens)
  }
}
