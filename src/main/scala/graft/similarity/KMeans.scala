package graft.similarity

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Spherical k-means training for the IVF tier — replaces
  * [[SimilarityOps.ivfAssign]]'s deterministic first-K centroid
  * initialization with actual Lloyd's iterations, so IVF cells reflect the
  * corpus geometry (tighter cells → fewer probes for the same recall).
  *
  * Scale shape per round: ONE scan assigns every vector to its max-cosine
  * centroid (broadcast of k×dim doubles — tiny by construction), then a
  * (cell, dimension) sum/count aggregate. The driver receives exactly
  * k×dim aggregate rows (16×64 here) to rebuild centroids plus one bounded
  * seeding sample ([[SeedSampleCap]] × dim) — never unbounded data rows;
  * the iteration count is a fixed small constant. That is the
  * standard distributed k-means: cost = iters × (1 scan + 1 bounded
  * aggregate).
  *
  * Cosine assignment is scale-invariant, so cell means are used unnormalized
  * (spherical k-means' normalization would not change any assignment).
  * Deterministic: farthest-point seeding, deterministic tie-breaks, fixed
  * rounds — same input → same centroids, which keeps downstream search
  * results reproducible. The training loop itself is not one SQL statement,
  * but because the output is deterministic the DECLARED IVF queries (since
  * r4) run against these trained centroids: SparkEntry trains once per
  * (session, dir), canonicalizes the centroids through decimal strings
  * ([[SimilarityOps.canonicalizeCentroids]]), and the oracle inlines the
  * identical literals. Quality and convergence remain spec-asserted
  * (SimilarityOpsSpec).
  */
object KMeans {

  /** Seeding-sample bound: the driver pulls at most this many vectors for
    * farthest-point seeding (cap × dim doubles ≈ 1 MB at 2048×64) — the
    * standard bounded-sample seeding every distributed k-means uses; the
    * Lloyd's rounds that actually fit centroids to the corpus stay fully
    * distributed.
    */
  val SeedSampleCap = 2048

  /** Deterministic farthest-point initialization (the greedy k-center /
    * k-means++-without-randomness seeding) over a bounded deterministic
    * sample: the `SeedSampleCap` vectors with the smallest md5(vec_id) —
    * partitioning-independent, so the seeds (and hence the trained
    * centroids) are reproducible. Start from the lowest vec_id in the
    * sample, then repeatedly add the sample vector LEAST similar to every
    * chosen seed (argmin of max-cosine, lowest-vec_id tie-break).
    *
    * First-K init can put every seed inside one dense cluster and strand
    * Lloyd's in a local optimum; farthest-point guarantees seed spread. The
    * r3 formulation ran the greedy argmin as k sequential Spark actions —
    * correct but each step compiled a fresh codegen plan (~1 s × k of pure
    * scheduling/compile cost); seeding quality never needed the full corpus.
    */
  def farthestPointInit(emb: DataFrame, k: Int = SimilarityOps.IvfCentroids): Array[Array[Double]] =
    farthestPointInitOn(prepare(emb), k)

  private def prepare(emb: DataFrame): DataFrame =
    graft.Tables.widen(emb)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .localCheckpoint()

  private def farthestPointInitOn(base: DataFrame, k: Int): Array[Array[Double]] = {
    // ONE bounded action: the deterministic seed sample (zero vectors are
    // never eligible as seeds — a zero-norm centroid has no defined cosine)
    val sample: Array[(Long, Array[Double])] = base
      .where(DotProduct(col("v"), col("v")) > 0)
      .withColumn("h", md5(concat(col("vec_id").cast("string"), lit(":seed"))))
      .orderBy(col("h"), col("vec_id"))
      .limit(SeedSampleCap)
      .select(col("vec_id"), col("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(sample.nonEmpty, "farthestPointInit: no non-zero vectors to seed from")
    // clamp rather than throw on tiny corpora: fewer seedable vectors than k
    // simply means fewer cells (the r4 require hard-failed the declared IVF
    // queries on small embedding tables — ADVICE r4)
    val kk = math.min(k, sample.length)

    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    val chosen = scala.collection.mutable.ArrayBuffer(sample.head._2)
    // incremental max-sim to the chosen set, classic O(k·n) greedy
    val maxSim = Array.fill(sample.length)(-2.0)
    while (chosen.size < kk) {
      val last = chosen.last
      var best = -1
      var i = 0
      while (i < sample.length) {
        val s = cos(sample(i)._2, last)
        if (s > maxSim(i)) maxSim(i) = s
        // strict < keeps the LOWEST vec_id on ties (sample is sorted by id)
        if (best < 0 || maxSim(i) < maxSim(best)) best = i
        i += 1
      }
      chosen += sample(best)._2
    }
    chosen.toArray
  }

  /** Train `k` centroids with `iters` Lloyd's rounds from the farthest-point
    * seeds. Returns (centroid_id → vector); empty cells keep their previous
    * centroid.
    */
  def trainCentroids(
      emb: DataFrame,
      k: Int = SimilarityOps.IvfCentroids,
      iters: Int = 5
  ): Array[Array[Double]] = {
    // one materialized projection shared by seeding and every Lloyd's round
    val base = prepare(emb)

    var centroids: Array[Array[Double]] = farthestPointInitOn(base, k)

    for (_ <- 0 until iters) {
      val assigned = assignCells(base, centroids)
      // per-(cell, dim) sums — k×dim aggregate rows to the driver, no data rows
      val sums = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect()
      // empty cells simply receive no sum rows and keep their old centroid
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        next(r.getAs[Int]("cell"))(r.getAs[Int]("pos")) =
          r.getAs[Double]("s") / r.getAs[Long]("n")
      }
      centroids = next
    }
    centroids
  }

  /** Max-cosine cell per vector: broadcast the k×dim centroid relation,
    * argmax via a map-side-combinable `max(struct(sim, -cell))` aggregate
    * (lowest-id tie-break). A literal-expression cascade would be
    * re-codegenned every Lloyd's round (the centroid literals change) at
    * ~seconds of compile time per round; the join shape keeps the compiled
    * expressions tiny and constant-shaped, and the ×k expansion collapses in
    * the partial aggregate — the plan a 1000-executor run wants too.
    *
    * Zero-norm guard: a zero vector would yield NaN cosine, and NaN compares
    * GREATER under Spark ordering — it would land in the last cell and
    * poison that cell's mean into all-NaN centroids. sim = -2 (below any
    * real cosine) pins it to cell 0 via the tie-break instead.
    */
  private def assignCells(base: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val cents = centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toSeq
      .toDF("cell", "cv")
      .withColumn("cn", sqrt(DotProduct(col("cv"), col("cv"))))
      .select(col("cell"), col("cv"), col("cn"))
    // both norms guarded: a zero-norm CENTROID (mean cancellation in a cell)
    // would make sim NaN for every vector, and NaN compares greatest — that
    // cell would absorb the whole corpus (ADVICE r4)
    val sim = when(
      col("vn") > 0 && col("cn") > 0,
      DotProduct(col("v"), col("cv")) / (col("vn") * col("cn"))
    ).otherwise(lit(-2.0))
    base
      .withColumn("vn", sqrt(DotProduct(col("v"), col("v"))))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), struct(sim.as("s"), (-col("cell")).as("negc")).as("sc"))
      .groupBy(col("vec_id"))
      .agg(first(col("v")).as("v"), max(col("sc")).as("best"))
      .select(col("vec_id"), col("v"), (-col("best.negc")).cast("int").as("cell"))
  }

  /** Mean cosine of each vector to its assigned centroid — the quantization
    * quality measure the training spec asserts improves over first-K init.
    */
  def assignmentQuality(emb: DataFrame, centroids: Array[Array[Double]]): Double = {
    val base = graft.Tables.widen(emb)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val n2 = DotProduct(col("v"), col("v"))
    val sims = centroids.map { c =>
      val lit_c = array(c.toIndexedSeq.map(lit): _*)
      val cn    = math.sqrt(c.map(x => x * x).sum)
      when(n2 > 0, DotProduct(col("v"), lit_c) / (sqrt(n2) * lit(cn))).otherwise(lit(-2.0))
    }.toSeq
    // variadic greatest — see assignCells for why not a when-reduce
    val bestSim = if (sims.size == 1) sims.head else greatest(sims: _*)
    base.agg(avg(bestSim)).first().getDouble(0)
  }

  /** First-K-by-vec_id centroids (the declared queries' initialization), for
    * quality comparison.
    */
  def firstKCentroids(emb: DataFrame, k: Int = SimilarityOps.IvfCentroids): Array[Array[Double]] =
    graft.Tables.widen(emb)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .where(col("vec_id") < k)
      .orderBy("vec_id")
      .collect()
      .map((r: Row) => r.getSeq[Double](1).toArray)
}
