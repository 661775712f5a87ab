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
  * [[packSequences]] is a LIBRARY operator (spec-asserted invariants);
  * [[packDeterministic]] is its declared oracle-able twin — the SAME greedy
  * core pinned to one globally doc_id-ordered partition, making the output a
  * pure function of the corpus (hash-checked against a DuckDB recursive-CTE
  * oracle). Token counts use [[TextOps.TokenRe]] so pack budgets mean the
  * same thing as the declared tokencount query.
  *
  * Documents longer than the budget get a singleton pack (the caller
  * decides whether to truncate or split upstream); empty docs pack as
  * zero-token members.
  */
object Packing {

  final case class PackedDoc(packId: Long, docId: Long, nTokens: Long, seqPos: Int)

  /** (doc_id, n_tokens) in a deterministic per-partition order, ready for the
    * greedy pass.
    */
  private def counted(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("long"),
      // null text packs as a zero-token member (the empty-doc rule): an
      // unguarded size() yields NULL, which the (Long, Long) tuple encoder
      // rejects with NOT_NULL_ASSERT_VIOLATION mid-job
      coalesce(
        size(regexp_extract_all(col("text"), lit(TextOps.TokenRe), lit(0))).cast("long"),
        lit(0L)).as("n_tokens")
    )

  /** The sequential greedy next-fit core, applied per partition: new pack
    * whenever the running total would exceed the budget; pack ids are
    * namespaced by partition id (a single-partition input therefore numbers
    * packs 0,1,2,… globally).
    */
  private def greedy(ds: Dataset[(Long, Long)], maxTokens: Long): Dataset[PackedDoc] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
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

  /** Pack by whitespace-token count under `maxTokens` per sequence —
    * partition-parallel, the 100 TB route.
    */
  def packSequences(docs: DataFrame, maxTokens: Long = 2048L): Dataset[PackedDoc] = {
    require(maxTokens > 0, s"maxTokens must be positive (got $maxTokens)")
    val spark = docs.sparkSession
    import spark.implicits._
    greedy(
      counted(graft.Tables.widen(docs))
        .as[(Long, Long)]
        // deterministic intra-partition order → deterministic packing per split
        .sortWithinPartitions("doc_id"),
      maxTokens
    )
  }

  /** The DECLARED deterministic twin: greedy next-fit over the corpus in
    * GLOBAL doc_id order on one pinned partition. Same greedy core as
    * [[packSequences]]; only the partitioning differs, so the result is a
    * pure function of the corpus and hash-checks against
    * [[oraclePackDeterministic]]. Small-scale by construction (a single
    * ordered partition is the price of a partition-independent ground
    * truth) — at 100 TB use [[packSequences]].
    */
  def packDeterministic(docs: DataFrame, maxTokens: Long = 512L): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive (got $maxTokens)")
    val spark = docs.sparkSession
    import spark.implicits._
    greedy(
      counted(docs).repartition(1).as[(Long, Long)].sortWithinPartitions("doc_id"),
      maxTokens
    )
      .map(p => (p.docId, p.nTokens, p.packId, p.seqPos.toLong))
      .toDF("doc_id", "n_tokens", "pack_id", "seq_pos")
      .orderBy("doc_id")
  }

  /** DuckDB ground truth for [[packDeterministic]]: the greedy recurrence as
    * a recursive CTE advancing one doc_id-ranked row per step (fine at
    * declared scale; the recursion IS the sequential semantics being
    * checked).
    */
  def oraclePackDeterministic(table: String, maxTokens: Long = 512L): String =
    s"""WITH RECURSIVE toks AS (
       |  SELECT doc_id,
       |    CAST(coalesce(len(regexp_extract_all(text, '${TextOps.TokenRe}')), 0) AS BIGINT) AS n_tokens,
       |    row_number() OVER (ORDER BY doc_id) AS rn
       |  FROM $table
       |), packed AS (
       |  SELECT rn, doc_id, n_tokens,
       |    CAST(0 AS BIGINT) AS pack_id, n_tokens AS used, CAST(0 AS BIGINT) AS seq_pos
       |  FROM toks WHERE rn = 1
       |  UNION ALL
       |  SELECT t.rn, t.doc_id, t.n_tokens,
       |    CASE WHEN p.used + t.n_tokens > $maxTokens THEN p.pack_id + 1 ELSE p.pack_id END,
       |    CASE WHEN p.used + t.n_tokens > $maxTokens THEN t.n_tokens ELSE p.used + t.n_tokens END,
       |    CASE WHEN p.used + t.n_tokens > $maxTokens THEN CAST(0 AS BIGINT) ELSE p.seq_pos + 1 END
       |  FROM toks t JOIN packed p ON t.rn = p.rn + 1
       |)
       |SELECT doc_id, n_tokens, pack_id, seq_pos FROM packed ORDER BY doc_id""".stripMargin

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

  // --- padding-waste planner -------------------------------------------------

  /** The fixed length-bucket ladder a batching layer pads to (powers of two,
    * the near-universal choice because kernels tile on them). Declared as a
    * constant so the CASE cascade is identical in both engines — a
    * `2^ceil(log2 n)` float round-trip would be a cross-engine hazard for
    * nothing.
    */
  val BucketLadder: Seq[Long] = Seq(32L, 64L, 128L, 256L, 512L, 1024L, 2048L, 4096L)

  /** Longest bucket: docs over the ladder top land here (a real batching
    * layer truncates them to it).
    */
  val BucketCap: Long = 8192L

  /** Padding-waste report — the planner's answer to "what does NOT packing
    * cost": bucket every document by token count into the smallest ladder
    * length that holds it, and report per bucket the doc count, true token
    * count, padded token count (`bucket_len · n_docs`, what a pad-to-bucket
    * batcher actually feeds the accelerator) and the waste ratio. Read next
    * to [[packingEfficiency]], this is the quantified argument for packing.
    *
    * One scan, per-row CASE projection, map-side-combinable groupBy on ≤9
    * bucket keys — the exchange carries the ladder, not the corpus. All
    * counts are exact longs; the single ratio is the declared
    * `CAST(long AS DOUBLE)/long` convention.
    */
  def paddingReport(docs: DataFrame): DataFrame = {
    val toks = size(regexp_extract_all(col("text"), lit(TextOps.TokenRe), lit(0))).cast("long")
    val bucket = BucketLadder.foldRight(lit(BucketCap)) { (len, acc) =>
      when(toks <= len, lit(len)).otherwise(acc)
    }
    graft.Tables.widen(docs)
      .select(bucket.as("bucket_len"), toks.as("n"))
      .groupBy("bucket_len")
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
      .withColumn("padded_tokens", col("bucket_len") * col("n_docs"))
      .withColumn(
        "waste",
        (col("padded_tokens") - col("n_tokens")).cast("double") / col("padded_tokens")
      )
      .orderBy("bucket_len")
  }

  /** DuckDB twin of [[paddingReport]] — the same ladder CASE, rollup and
    * ratio.
    */
  def oraclePaddingReport: String = {
    val cases = BucketLadder.map(l => s"WHEN n <= $l THEN $l").mkString(" ")
    s"""WITH toks AS (
       |  SELECT CAST(len(regexp_extract_all(text, '${TextOps.TokenRe}')) AS BIGINT) AS n
       |  FROM documents),
       |b AS (SELECT CASE $cases ELSE $BucketCap END AS bucket_len, n FROM toks),
       |g AS (
       |  SELECT bucket_len, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens
       |  FROM b GROUP BY bucket_len)
       |SELECT bucket_len, n_docs, n_tokens,
       |  bucket_len * n_docs AS padded_tokens,
       |  CAST(bucket_len * n_docs - n_tokens AS DOUBLE) / (bucket_len * n_docs) AS waste
       |FROM g ORDER BY bucket_len""".stripMargin
  }
}
