package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding table (`vec_id, embedding:
  * array<float>, label` — TESTDATA.md `embeddings`). North-star family
  * (SURVEY.md §7.4).
  *
  * Two tiers:
  *
  *  1. '''Exact brute-force cosine top-k''' ([[cosineTopK]]) — the baseline
  *     and the rerank stage: broadcast the (small) query set against the
  *     vector table; per-row norms are computed once and reused. Exact top-k
  *     over the full table is inherently a scan — at the 100 TB design point
  *     this op is the final rerank over LSH/IVF candidates, not the primary
  *     search path.
  *  2. '''Random-hyperplane LSH''' ([[lshBuckets]], [[annTopK]]) — 16
  *     sign-random ±1 hyperplanes → 16-bit bucket per vector; search joins
  *     queries to vectors by bucket (with hamming-≤1 multiprobe) and reranks
  *     the candidates exactly. Candidate work scales with bucket occupancy,
  *     never |vectors|·|queries|.
  *
  * Engine-portable numerics: cosine is computed as sequential double folds
  * (the native [[DotProduct]] expression — same summation order as an
  * `aggregate` fold but a compiled loop instead of Spark's INTERPRETED
  * higher-order-function evaluation; verified ≤1 ulp from DuckDB's
  * `list_cosine_similarity` on the full corpus) and
  * DECLARED only rounded to 6 decimals, with ranking tie-broken by vec_id.
  * Bucket signatures avoid float order-sensitivity entirely: components are
  * quantized to integers (×1000, round) before the ±1 dot, so the bucket is
  * exact integer math in both engines.
  */
object SimilarityOps {

  val Dim       = 64
  val NumPlanes = 16
  val Quant     = 1000

  /** ±1 hyperplane components, LCG-derived (bit 16 of the LCG state — low
    * LCG bits are not pseudorandom).
    */
  val hyperplanes: Array[Array[Int]] = Array.tabulate(NumPlanes, Dim) { (k, d) =>
    val lcg = (1103515245L * (k * Dim + d + 1) + 12345L) % 2147483648L
    if (((lcg >> 16) & 1L) == 0L) 1 else -1
  }

  private val dv    = expr("transform(embedding, x -> CAST(x AS DOUBLE))")
  private def norm2(v: Column): Column = DotProduct(v, v)

  // --- exact brute-force top-k ---------------------------------------------

  /** Exact cosine top-k for a literal query-id set: one broadcast join, one
    * per-group rank. Output: (qid, rank, vec_id, sim_r) with sim rounded to
    * 6 decimals; ordering on the RAW similarity (cross-engine identical to
    * 1 ulp; adjacent top-k gaps are ≥1e-4 on this corpus), vec_id tie-break.
    */
  def cosineTopK(emb: DataFrame, queryIds: Seq[Long] = Seq(0L, 1L, 2L), k: Int = 10): DataFrame = {
    val base = graft.Tables.widen(emb).select(col("vec_id"), dv.as("v")).withColumn("n2", norm2(col("v")))
    val q = base
      .where(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"))
    val dot = DotProduct(col("v"), col("qv"))
    val sim = dot / (sqrt(col("qn2")) * sqrt(col("n2")))
    val w   = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    base
      .crossJoin(broadcast(q))
      .withColumn("sim", sim)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), round(col("sim"), 6).as("sim_r"))
      .orderBy("qid", "rank")
  }

  def oracleCosineTopK(queryIds: Seq[Long] = Seq(0L, 1L, 2L), k: Int = 10): String = {
    val ids = queryIds.mkString(", ")
    s"""WITH q AS (
       |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id IN ($ids)),
       |s AS (
       |  SELECT q.qid, e.vec_id,
       |    list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
       |  FROM q, embeddings e),
       |r AS (
       |  SELECT qid, vec_id, sim,
       |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
       |  FROM s)
       |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, round(sim, 6) AS sim_r
       |FROM r WHERE rank <= $k ORDER BY qid, rank""".stripMargin
  }

  // --- LSH bucketing --------------------------------------------------------

  /** Quantized embedding: per-component round(x·1000) as BIGINT — makes every
    * downstream dot an exact integer sum (order-free in both engines).
    */
  private val qvec =
    expr(s"transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * $Quant, 0) AS BIGINT))")

  private def bucketExpr(vcol: String): Column = {
    val planeDots = hyperplanes.zipWithIndex.map { case (h, j) =>
      val signs = h.mkString("array(", "L, ", "L)")
      val dot   = s"aggregate(zip_with($vcol, $signs, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"
      s"IF($dot > 0, ${1L << j}L, 0L)"
    }
    expr(planeDots.mkString("", " + ", ""))
  }

  /** 16-bit random-hyperplane bucket per vector. Pure per-row integer math —
    * no shuffle, embarrassingly parallel.
    */
  def lshBuckets(emb: DataFrame): DataFrame =
    graft.Tables.widen(emb)
      .select(col("vec_id"), qvec.as("qv"))
      .withColumn("bucket", bucketExpr("qv"))
      .select(col("vec_id"), col("bucket"))
      .orderBy("vec_id")

  def oracleLshBuckets: String = {
    val planeDots = hyperplanes.zipWithIndex.map { case (h, j) =>
      val signs = h.mkString("[", ", ", "]")
      val dot =
        s"list_sum(list_transform(list_zip(qv, $signs), p -> p[1] * p[2]))"
      s"(CASE WHEN $dot > 0 THEN ${1L << j} ELSE 0 END)"
    }
    val bucket = planeDots.mkString(" + ")
    s"""SELECT vec_id, CAST($bucket AS BIGINT) AS bucket FROM (
       |  SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]), x -> CAST(round(x * $Quant) AS BIGINT)) AS qv
       |  FROM embeddings
       |) ORDER BY vec_id""".stripMargin
  }

  // --- IVF (inverted-file) partitioning -------------------------------------

  /** Number of IVF centroids; centroids are the first K vectors by vec_id —
    * deterministic without a training loop (a production build would k-means
    * these; the partitioning/probing machinery is identical).
    */
  val IvfCentroids = 16

  /** IVF cell assignment: each vector goes to its max-cosine centroid
    * (tie-break lowest centroid id). One broadcast of K centroid vectors —
    * the assignment itself is a map-side pass, no shuffle; at scale you
    * write the table partitioned by `centroid_id` and a query probes only
    * its closest cells.
    */
  def ivfAssign(emb: DataFrame): DataFrame = {
    val base = graft.Tables.widen(emb).select(col("vec_id"), dv.as("v")).withColumn("n2", norm2(col("v")))
    val cents = base
      .where(col("vec_id") < IvfCentroids)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"), col("n2").as("cn2"))
    val dot = DotProduct(col("v"), col("cv"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("centroid_id"))
    base
      .crossJoin(broadcast(cents))
      .withColumn("sim", dot / (sqrt(col("n2")) * sqrt(col("cn2"))))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"), round(col("sim"), 6).as("sim_r"))
      .orderBy("vec_id")
  }

  def oracleIvfAssign: String =
    s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cents AS (SELECT vec_id AS centroid_id, v AS cv FROM base WHERE vec_id < $IvfCentroids),
       |sims AS (
       |  SELECT b.vec_id, c.centroid_id, list_cosine_similarity(b.v, c.cv) AS sim,
       |    row_number() OVER (PARTITION BY b.vec_id ORDER BY list_cosine_similarity(b.v, c.cv) DESC, c.centroid_id) AS rn
       |  FROM base b, cents c)
       |SELECT vec_id, centroid_id, round(sim, 6) AS sim_r
       |FROM sims WHERE rn = 1 ORDER BY vec_id""".stripMargin

  /** IVF probing search: exact cosine over only the vectors in the query's
    * `nprobe` closest cells, reranked. Candidate volume ≈ nprobe/K of the
    * corpus instead of all of it.
    */
  def ivfTopK(
      emb: DataFrame,
      queryIds: Seq[Long] = Seq(0L, 1L, 2L),
      k: Int = 10,
      nprobe: Int = 4
  ): DataFrame = {
    val base = graft.Tables.widen(emb).select(col("vec_id"), dv.as("v")).withColumn("n2", norm2(col("v")))
    val cents = base
      .where(col("vec_id") < IvfCentroids)
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"), col("n2").as("cn2"))
    val cdot = DotProduct(col("v"), col("cv"))
    val aw = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("centroid_id"))
    val assigned = base
      .crossJoin(broadcast(cents))
      .withColumn("csim", cdot / (sqrt(col("n2")) * sqrt(col("cn2"))))
      .withColumn("rn", row_number().over(aw))
    val cells = assigned.where(col("rn") === 1).select(col("vec_id"), col("v"), col("n2"), col("centroid_id"))
    val probes = assigned
      .where(col("vec_id").isInCollection(queryIds) && col("rn") <= nprobe)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("n2").as("qn2"), col("centroid_id"))
    val qdot = DotProduct(col("v"), col("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    cells
      .join(probes, Seq("centroid_id"))
      .withColumn("sim", qdot / (sqrt(col("qn2")) * sqrt(col("n2"))))
      .select(col("qid"), col("vec_id"), col("sim"))
      .distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .orderBy("qid", "rank")
  }

  // --- embedding-cosine near-dup --------------------------------------------

  /** Exact embedding near-duplicate pairs: all ordered pairs with cosine ≥
    * threshold. This is the EXACT tier — deliberately quadratic, the
    * verifier/rerank stage; at scale, generate candidates from
    * [[lshBuckets]] (hamming-probe the sketch) and rerank with this exact
    * cosine, exactly as [[annTopK]] does for search. Declared with an
    * all-pairs oracle because its semantics are exact (an LSH-filtered
    * variant would not match an exact oracle on corpora with borderline
    * pairs).
    */
  def cosineDupPairs(emb: DataFrame, threshold: Double = 0.9): DataFrame = {
    val base = graft.Tables.widen(emb).select(col("vec_id"), dv.as("v")).withColumn("n2", norm2(col("v")))
    val b = base.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("n2").as("nb"))
    val dot = DotProduct(col("v"), col("vb"))
    base
      .crossJoin(b)
      .where(col("vec_id") < col("vec_b"))
      .withColumn("sim", dot / (sqrt(col("n2")) * sqrt(col("nb"))))
      .where(col("sim") >= threshold)
      .select(col("vec_id").as("vec_a"), col("vec_b"), round(col("sim"), 6).as("sim_r"))
      .orderBy("vec_a", "vec_b")
  }

  def oracleCosineDupPairs(threshold: Double = 0.9): String =
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS sim_r
       |FROM embeddings a, embeddings b
       |WHERE a.vec_id < b.vec_id
       |  AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= $threshold
       |ORDER BY vec_a, vec_b""".stripMargin

  // --- bucketed ANN ---------------------------------------------------------

  /** Approximate top-k: candidates = vectors whose bucket is within hamming
    * distance `maxHamming` of the query's bucket (multiprobe by exploding the
    * probe set), reranked exactly. The join key is the bucket — at scale this
    * is a co-partitioned equi-join against a bucket-partitioned vector table.
    */
  def annTopK(
      emb: DataFrame,
      queryIds: Seq[Long] = Seq(0L, 1L, 2L),
      k: Int = 10,
      maxHamming: Int = 1
  ): DataFrame = {
    val base = graft.Tables.widen(emb)
      .select(col("vec_id"), dv.as("v"), qvec.as("qv"))
      .withColumn("bucket", bucketExpr("qv"))
      .withColumn("n2", norm2(col("v")))
      .drop("qv")
    val probeOffsets: Seq[Long] =
      0L +: (if (maxHamming >= 1) (0 until NumPlanes).map(j => 1L << j) else Seq.empty)
    val q = base
      .where(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("qid"), col("v").as("qvd"), col("n2").as("qn2"), col("bucket").as("qbucket"))
      .withColumn("probe", explode(array(probeOffsets.map(o => lit(o)): _*)))
      // XOR with each single-bit mask (and 0) = all buckets within hamming 1
      .withColumn("pbucket", expr("qbucket ^ probe"))
      .drop("probe", "qbucket")
    val dot = DotProduct(col("v"), col("qvd"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    base
      .join(q, col("bucket") === col("pbucket"))
      .withColumn("sim", dot / (sqrt(col("qn2")) * sqrt(col("n2"))))
      .select(col("qid"), col("vec_id"), col("sim"))
      .distinct() // a vector can be reached via multiple probes
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .orderBy("qid", "rank")
  }
}
