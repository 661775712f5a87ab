package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination screening: find corpus documents sharing at
  * least `minShared` distinct 3-token shingles with any document of a
  * benchmark/eval set — the decontamination pass every serious training
  * corpus runs so eval answers don't leak into training data.
  *
  * Shape: the same inverted-index discipline as the Jaccard tier — join
  * the (distinct) corpus shingle postings against the (small) benchmark
  * side on shingle identity, count distinct shared shingles per
  * (corpus doc, benchmark doc), threshold. Work scales with posting-list
  * co-occurrence, never |corpus|×|benchmark|; at 100 TB the benchmark side
  * is small enough to broadcast, making this a map-side join against a
  * corpus-wide shingle scan, and hot shingles take the same df-cap escape
  * hatch as [[DedupOps.jaccardPairs]].
  *
  * The threshold is on an ABSOLUTE shared-shingle count, not a ratio:
  * contamination screening wants recall (a 10-shingle verbatim quote inside
  * a long document is a leak even though its Jaccard is tiny).
  */
object Contamination {

  /** Contaminated (corpus doc, benchmark doc, shared-shingle count) pairs.
    *
    * @param benchIds single-column `doc_id` frame naming the benchmark docs
    *   (typically a hash-gated sample or an external id list); benchmark
    *   docs themselves are not reported against each other or themselves.
    * @param maxShingleDf drop shingles occurring in more than this many
    *   corpus docs before the join (the hot-key guard; bounded recall loss).
    * @param distinctShingles optional pre-materialized distinct
    *   (doc_id, shingle) postings of `docs` — when a pipeline runs several
    *   screens over the SAME corpus (plain + capped + the decontamination
    *   cut, as the declared surface does), the distinct-shingle exchange is
    *   their dominant shared stage, and paying it once per SESSION instead
    *   of once per screen is the difference the trio-context scale row in
    *   BASELINE.md measures (VERDICT r15 #5). The caller owns the
    *   materialization (persist/checkpoint); semantics are identical.
    */
  def contaminatedPairs(
      docs: DataFrame,
      benchIds: DataFrame,
      minShared: Long = 5L,
      maxShingleDf: Option[Int] = None,
      distinctShingles: Option[DataFrame] = None
  ): DataFrame = {
    // materialized once: the distinct postings feed BOTH join sides (and the
    // df filter when capped) — without the checkpoint each consumer re-runs
    // the tokenize+explode+distinct subtree (r3 housekeeping #4). At 100 TB
    // the same reuse is a persisted/bucketed postings table instead of an
    // in-memory checkpoint.
    val sh0 = distinctShingles.getOrElse(
      DedupOps.shingleDF(docs).distinct().localCheckpoint())
    val sh = maxShingleDf match {
      case Some(cap) =>
        val hot = sh0.groupBy(col("shingle")).agg(count(lit(1)).as("df")).where(col("df") > cap)
        sh0.join(hot, Seq("shingle"), "left_anti")
      case None => sh0
    }
    val bench = sh
      .join(benchIds.select(col("doc_id")), Seq("doc_id"))
      .select(col("doc_id").as("bench_doc_id"), col("shingle"))
    // corpus side excludes the benchmark docs themselves: the screening
    // contract reports TRAINING docs that leak a bench doc, never bench
    // docs against each other (they are not training candidates)
    val corpus = sh.join(benchIds.select(col("doc_id")), Seq("doc_id"), "left_anti")
    corpus
      .join(bench, Seq("shingle"))
      .groupBy(col("doc_id"), col("bench_doc_id"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
      .orderBy("doc_id", "bench_doc_id")
  }

  /** Bloom-pruned variant of [[contaminatedPairs]] — IDENTICAL answer (a
    * Bloom filter has no false negatives, and its false positives are
    * eliminated by the exact equi-join that follows), different 100 TB cost
    * profile, so the declared twin shares the uncapped oracle SQL verbatim.
    *
    * [[contaminatedPairs]] shuffles EVERY distinct corpus shingle before the
    * bench join. Here a Bloom filter over the (small) benchmark shingle set
    * is broadcast and applied to the corpus shingle stream map-side, so only
    * shingles that *might* be benchmark shingles ever reach the distinct's
    * exchange — at a 10⁶:1 corpus:bench ratio that converts the dominant
    * shuffle into a ~fpp-sized trickle. The alternative pre-shuffle prune —
    * broadcasting the full bench postings and joining before distinct —
    * ships shingle strings + doc ids to every executor; the Bloom is ~10
    * bits per key regardless of shingle length, which is why it is the
    * declared scale configuration.
    *
    * The membership probe is [[BloomMightContain]] — a native codegen
    * expression over the broadcast sketch (Spark's sketch Bloom has no
    * public Column form), so the corpus-shingle filter stage and every
    * aggregate/join downstream stay whole-stage-codegen'd; PlanShapeSpec
    * pins the probe's presence and the absence of any UDF node.
    */
  def contaminatedPairsBloom(
      docs: DataFrame,
      benchIds: DataFrame,
      minShared: Long = 5L,
      fpp: Double = 0.01
  ): DataFrame = {
    val bench0 = benchIds.select(col("doc_id"))
    // benchmark postings: small side, materialized once — feeds the Bloom
    // build, the exact join, and the bench_doc_id labels
    val benchSh = DedupOps.shingleDF(docs.join(bench0, Seq("doc_id")))
      .distinct()
      .localCheckpoint()
    val nBenchSh = benchSh.count()
    if (nBenchSh == 0L) {
      // no benchmark shingles (empty bench slice or all-short docs): nothing
      // can be contaminated — and bloomFilter() on an empty frame yields a
      // null-buffer sketch that NPEs on first probe, so return the empty
      // result directly instead of building one
      val spark = docs.sparkSession
      import spark.implicits._
      return Seq.empty[(Long, Long, Long)].toDF("doc_id", "bench_doc_id", "shared")
    }
    val bloom = benchSh.stat.bloomFilter("shingle", nBenchSh, fpp)
    val bcast = docs.sparkSession.sparkContext.broadcast(bloom)
    // corpus side: bench docs excluded BEFORE shingling (cheaper than the
    // postings-side anti-join), Bloom applied before the distinct so the
    // big exchange only carries probable-bench shingles
    val corpusSh = DedupOps.shingleDF(docs.join(bench0, Seq("doc_id"), "left_anti"))
      .where(BloomMightContain(col("shingle"), bcast))
      .distinct()
    corpusSh
      .join(benchSh.select(col("doc_id").as("bench_doc_id"), col("shingle")), Seq("shingle"))
      .groupBy(col("doc_id"), col("bench_doc_id"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
      .orderBy("doc_id", "bench_doc_id")
  }

  /** DuckDB twin for the declared form: benchmark = the md5-gated sample of
    * the documents table at `benchFraction` with salt `benchSalt`.
    */
  def oracleContaminatedPairs(
      minShared: Long = 5L,
      benchFraction: Double = 0.05,
      benchSalt: String = "bench"
  ): String = {
    val thr = math.floor(benchFraction * graft.sampling.Sampling.HashSpace).toLong
    s"""WITH ${DedupOps.oracleShingleCte},
       |bench AS (
       |  SELECT doc_id FROM documents
       |  WHERE CAST('0x' || substr(md5(doc_id || ':$benchSalt'), 1, 8) AS BIGINT) < $thr)
       |SELECT c.doc_id, b.doc_id AS bench_doc_id, count(*) AS shared
       |FROM sh c
       |JOIN sh b ON c.s = b.s
       |JOIN bench ON b.doc_id = bench.doc_id
       |WHERE c.doc_id NOT IN (SELECT doc_id FROM bench)
       |GROUP BY c.doc_id, b.doc_id
       |HAVING count(*) >= $minShared
       |ORDER BY c.doc_id, bench_doc_id""".stripMargin
  }

  /** DuckDB twin of the CAPPED declared form — identical hot-shingle filter:
    * document frequency measured on the full distinct postings (benchmark
    * docs included, same as the Spark side), shingles with df > cap dropped
    * from BOTH join sides before co-occurrence counting.
    */
  def oracleContaminatedPairsCapped(
      minShared: Long = 5L,
      benchFraction: Double = 0.05,
      benchSalt: String = "bench",
      maxShingleDf: Int = 100
  ): String = {
    val thr = math.floor(benchFraction * graft.sampling.Sampling.HashSpace).toLong
    s"""WITH ${DedupOps.oracleShingleCte},
       |cold AS (SELECT s FROM sh GROUP BY s HAVING count(*) <= $maxShingleDf),
       |shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN cold ON sh.s = cold.s),
       |bench AS (
       |  SELECT doc_id FROM documents
       |  WHERE CAST('0x' || substr(md5(doc_id || ':$benchSalt'), 1, 8) AS BIGINT) < $thr)
       |SELECT c.doc_id, b.doc_id AS bench_doc_id, count(*) AS shared
       |FROM shc c
       |JOIN shc b ON c.s = b.s
       |JOIN bench ON b.doc_id = bench.doc_id
       |WHERE c.doc_id NOT IN (SELECT doc_id FROM bench)
       |GROUP BY c.doc_id, b.doc_id
       |HAVING count(*) >= $minShared
       |ORDER BY c.doc_id, bench_doc_id""".stripMargin
  }
}
