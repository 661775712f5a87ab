package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-ATTRIBUTION main (VERDICT r18 #1): the scale-tile rehearsal
  * (`tools/scale_tile.py` + [[graft.ScaleBench]]) records WALL TIME per
  * tile; this main records the COST DRIVERS next to the wall time for the
  * two families that now lead the bench, so BASELINE.md can state WHAT each
  * curve tracks rather than just its slope:
  *
  *  - '''IVF+PQ search''' ([[Pq.ivfPqTopK]]): is time bounded by the PRUNED
  *    candidate volume rather than the corpus? Reported per tile:
  *    `n_vectors` (corpus after the zero-norm exclusion), `candidates`
  *    (post-nprobe (qid, vec_id) pairs — exactly what the ADC tier scores),
  *    the search time with training paid separately (`train_*`), and the
  *    full-corpus ADC comparator [[Pq.adcTopK]] — the same scoring with NO
  *    IVF prune, i.e. what the time would track without the cell filter.
  *  - '''rank-select quantiles''' ([[graft.stats.NumericStats.quantiles]] /
  *    madStats / groupQuantiles): is time sort-bound? Reported per tile:
  *    one median-only rank-select pass (range sort + two bounded jobs over
  *    the same relation madStats sorts twice), the map-combined aggregate
  *    scan floor over the same columns (what a sort-free pass over the
  *    bytes costs), and the declared mad/group-quantile entries themselves.
  *    Sort-bound means `mad ≈ 2·median_pass + scan_floor` with
  *    `median_pass ≫ scan_floor`.
  *
  * Usage: `runMain graft.similarity.ScaleAttr <tileDir>` — prints ONE JSON
  * line. Single measurement per entry, JIT-warmed end-to-end on sf0.001,
  * 1-min load sampled before and after for the load attribution BASELINE.md
  * records next to every tile row (the rehearsal compares a tile to another
  * tile of ITSELF, so the noise band applies to both ends of every ratio).
  * Diagnostic only: nothing here is a declared query, and the declared
  * plans in [[Pq]]/NumericStats are untouched.
  */
object ScaleAttr {

  /** The candidate relation [[Pq.ivfPqTopK]] ADC-scores — the same argmax
    * cell assignment and nprobe probe expansion (mirrors `Pq.scala:342-366`;
    * it lives in this package to share the package-private
    * [[SimilarityOps.baseVectors]]/[[SimilarityOps.centroidDF]] vocabulary
    * instead of re-deriving the zero-norm exclusion). [[ScaleAttrSpec]]
    * pins the mirror against the production plan: every reranked hit must
    * come out of THIS relation, so the two cannot drift silently.
    */
  def ivfCandidates(
      emb: DataFrame,
      centroids: Array[Array[Double]],
      queryIds: Seq[Long] = Seq(0L, 1L, 2L),
      nprobe: Int = 4
  ): DataFrame = {
    val base  = SimilarityOps.baseVectors(emb)
    val cents = SimilarityOps.centroidDF(emb, centroids)
    val csim  = DotProduct(col("v"), col("cv")) / (sqrt(col("n2")) * sqrt(col("cn2")))
    val scored = base
      .crossJoin(broadcast(cents))
      .select(col("vec_id"),
        struct(csim.as("s"), (-col("centroid_id")).as("negc")).as("sc"))
    val cells = scored
      .groupBy(col("vec_id"))
      .agg(max(col("sc")).as("best"))
      .select(col("vec_id"), (-col("best.negc")).as("centroid_id"))
    val probes = scored
      .where(col("vec_id").isInCollection(queryIds))
      .groupBy(col("vec_id"))
      .agg(slice(sort_array(collect_list(col("sc")), asc = false), 1, nprobe).as("top"))
      .select(col("vec_id").as("qid"), explode(col("top")).as("sc"))
      .select(col("qid"), (-col("sc.negc")).as("centroid_id"))
    cells
      .join(broadcast(probes), Seq("centroid_id"))
      .select(col("qid"), col("vec_id"))
  }

  /** Corpus size AFTER the zero-norm exclusion — the `N` the candidate
    * fraction is measured against (exposed for [[ScaleAttrSpec]]).
    */
  def liveVectors(emb: DataFrame): Long = SimilarityOps.baseVectors(emb).count()

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r  = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** One full measurement sweep over a tile dir: (counts, seconds).
    * `nQueries` widens the query batch past the declared default of 3 —
    * the IVF assignment scan is query-independent while full-ADC work is
    * |Q|-linear, so sweeping |Q| measures WHERE the prune's saving
    * overtakes the index-build term (the amortization claim in
    * BASELINE.md's attribution section).
    */
  private def measure(spark: SparkSession, dir: String, nQueries: Int): (Seq[(String, Long)], Seq[(String, Double)]) = {
    val qids = (0L until nQueries.toLong).toSeq
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val (cents, tTrainIvf) = timed(
      SimilarityOps.canonicalizeCentroids(KMeans.trainCentroids(emb)))
    val (cbs, tTrainPq) = timed(Pq.trainCodebooks(emb))
    val nVec            = SimilarityOps.baseVectors(emb).count()
    val (nCand, tCand)  = timed(ivfCandidates(emb, cents, qids).count())
    val (_, tIvfpq)     = timed(Pq.ivfPqTopK(emb, cents, cbs, qids).count())
    val (_, tAdcFull)   = timed(Pq.adcTopK(emb, cbs, qids).count())

    val li   = graft.Tables.load(spark, dir, "lineitem")
    val cols = graft.SparkEntry.madCols
    val nLi  = li.count()
    // map-combined scan floor: same columns, same cast+abs per value, zero
    // sort — the cost of touching the bytes once without ranking them
    val (_, tScan) = timed(
      li.select(cols.map(c => sum(abs(col(c).cast("double"))).as(c)): _*).count())
    val (_, tMedian) = timed(
      graft.stats.NumericStats.quantiles(li, cols, Seq(0.5)).count())
    val (_, tMad) = timed(
      graft.stats.NumericStats.madStats(li, cols).count())
    val (_, tGq) = timed(
      graft.stats.NumericStats.groupQuantiles(
        li, "l_returnflag", Seq("l_quantity", "l_extendedprice"),
        Seq(0.25, 0.5, 0.75, 0.95)).count())

    val counts = Seq(
      "n_vectors" -> nVec, "n_queries" -> nQueries.toLong,
      "candidates" -> nCand, "rows_lineitem" -> nLi)
    val secs = Seq(
      "train_ivf" -> tTrainIvf, "train_pq" -> tTrainPq,
      "ivf_candidates" -> tCand, "ivfpq_topk" -> tIvfpq,
      "adc_full" -> tAdcFull,
      "scan_floor" -> tScan, "median_pass" -> tMedian,
      "mad" -> tMad, "group_quantiles" -> tGq)
    (counts, secs)
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1 || args.length == 2,
      "usage: ScaleAttr <tileDir> [nQueries]")
    val dir = args(0)
    val nQ  = args.lift(1).map(_.toInt).getOrElse(3)
    require(nQ > 0, "nQueries must be positive")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val warmDir = "/root/testdata/sf0.001"
    val drift = Seq(dir, warmDir).distinct.flatMap(d =>
      graft.Tables.preflight(spark, d).map(m => s"$d: $m"))
    if (drift.nonEmpty) {
      drift.foreach(m => System.err.println(s"[scaleattr] PREFLIGHT: $m"))
      spark.stop()
      sys.exit(2)
    }

    // JIT warm-up: the IDENTICAL sweep on the smallest SF, result discarded
    measure(spark, warmDir, nQ)

    val loadBefore       = graft.Bench.loadAvg()
    val (counts, secs)   = measure(spark, dir, nQ)
    val loadAfter        = graft.Bench.loadAvg()
    val countJson = counts.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val secJson = secs
      .map { case (k, v) => s""""$k":${math.round(v * 100) / 100.0}""" }
      .mkString(",")
    println(
      s"""{"dir":"$dir",$countJson,"load_before":$loadBefore,"load_after":$loadAfter,"sec":{$secJson}}""")
    spark.stop()
  }
}
