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
  * k×dim aggregate rows (16×64 here) to rebuild centroids — never data
  * rows; the iteration count is a fixed small constant. That is the
  * standard distributed k-means: cost = iters × (1 scan + 1 bounded
  * aggregate).
  *
  * Cosine assignment is scale-invariant, so cell means are used unnormalized
  * (spherical k-means' normalization would not change any assignment).
  * Deterministic: farthest-point seeding, deterministic tie-breaks, fixed
  * rounds — same input → same centroids, which keeps downstream search
  * results reproducible. Not oracle-declared (a multi-round iterative fixpoint is
  * not one SQL statement); quality and convergence are spec-asserted
  * (SimilarityOpsSpec) and the declared IVF queries keep the first-K
  * centroids so their oracles stay closed-form.
  */
object KMeans {

  /** Deterministic farthest-point initialization (the greedy k-center /
    * k-means++-without-randomness seeding): start from the lowest vec_id,
    * then repeatedly add the vector LEAST similar to every chosen centroid
    * (argmin of max-cosine, lowest-vec_id tie-break). First-K init can put
    * every seed inside one dense cluster and strand Lloyd's in a local
    * optimum; farthest-point guarantees seed spread. Cost: k bounded
    * single-row argmin aggregates — no data rows to the driver.
    */
  def farthestPointInit(emb: DataFrame, k: Int = SimilarityOps.IvfCentroids): Array[Array[Double]] =
    farthestPointInitOn(prepare(emb), k)

  private def prepare(emb: DataFrame): DataFrame =
    graft.Tables.widen(emb)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .localCheckpoint()

  private def farthestPointInitOn(base: DataFrame, k: Int): Array[Array[Double]] = {
    val first = base.orderBy("vec_id").select("v").first().getSeq[Double](0).toArray
    val chosen = scala.collection.mutable.ArrayBuffer(first)
    val n2 = DotProduct(col("v"), col("v"))
    while (chosen.size < k) {
      val sims = chosen.toSeq.map { c =>
        val cn = math.sqrt(c.map(x => x * x).sum)
        DotProduct(col("v"), array(c.map(lit): _*)) / (sqrt(n2) * lit(cn))
      }
      val maxSim = sims.reduce((a, b) => when(a >= b, a).otherwise(b))
      val next = base
        .select(col("vec_id"), col("v"), maxSim.as("ms"))
        .orderBy(col("ms").asc, col("vec_id").asc)
        .select("v")
        .first()
        .getSeq[Double](0)
        .toArray
      chosen += next
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

  /** Max-cosine cell per vector against literal centroids (broadcast as a
    * codegen'd when-cascade over the native DotProduct — no join needed for
    * a k this small).
    */
  private def assignCells(base: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val n2 = DotProduct(col("v"), col("v"))
    // sim_c = dot(v, c) / (|v| |c|); argmax with lowest-id tie-break
    val sims = centroids.zipWithIndex.map { case (c, i) =>
      val lit_c = array(c.map(lit): _*)
      val cn    = math.sqrt(c.map(x => x * x).sum)
      (DotProduct(col("v"), lit_c) / (sqrt(n2) * lit(cn)), i)
    }
    val best = sims.foldLeft(lit(-2.0).as("bs") -> lit(-1).as("bc")) { case ((bs, bc), (s, i)) =>
      val better = s > bs
      (when(better, s).otherwise(bs), when(better, lit(i)).otherwise(bc))
    }
    base.select(col("vec_id"), col("v"), best._2.cast("int").as("cell"))
  }

  /** Mean cosine of each vector to its assigned centroid — the quantization
    * quality measure the training spec asserts improves over first-K init.
    */
  def assignmentQuality(emb: DataFrame, centroids: Array[Array[Double]]): Double = {
    val base = graft.Tables.widen(emb)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val n2 = DotProduct(col("v"), col("v"))
    val sims = centroids.map { c =>
      val lit_c = array(c.map(lit): _*)
      val cn    = math.sqrt(c.map(x => x * x).sum)
      DotProduct(col("v"), lit_c) / (sqrt(n2) * lit(cn))
    }
    val bestSim = sims.reduce((a, b) => when(a >= b, a).otherwise(b))
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
