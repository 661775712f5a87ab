package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale experiment for the capped contamination screen's x50 curve: times
  * alternative formulations of the df-cap housekeeping on a tiled dir so a
  * plan change is justified by measurement, not plan-reading alone.
  *
  * {{{
  * sbt -batch "Test/runMain graft.CappedExperiment /tmp/graft_scale/x50"
  * }}}
  */
object CappedExperiment {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/x50")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = Tables.load(spark, dir, "documents")
    def benchIds = graft.sampling.Sampling
      .sampleByHash(docs, "doc_id", 0.05, salt = "bench").select("doc_id")
    val cap = 100
    val minShared = 5L

    // A: the declared formulation (checkpointed raw postings; hot derived
    // lazily, so its aggregate is inlined into both consumers)
    def variantA(): DataFrame =
      graft.dedup.Contamination.contaminatedPairs(docs, benchIds, minShared, Some(cap))

    // B: hot list materialized once (tiny frame), so the full-postings df
    // aggregate cannot be replanned per consumer
    def variantB(): DataFrame = {
      val sh0 = graft.dedup.DedupOps.shingleDF(docs).distinct().localCheckpoint()
      val hot = sh0.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .where(col("df") > cap).select("shingle").localCheckpoint()
      val sh = sh0.join(hot, Seq("shingle"), "left_anti")
      val bench = sh.join(benchIds, Seq("doc_id"))
        .select(col("doc_id").as("bench_doc_id"), col("shingle"))
      val corpus = sh.join(benchIds, Seq("doc_id"), "left_anti")
      corpus.join(bench, Seq("shingle"))
        .groupBy(col("doc_id"), col("bench_doc_id"))
        .agg(count(lit(1)).as("shared"))
        .where(col("shared") >= minShared)
        .orderBy("doc_id", "bench_doc_id")
    }

    // C: capped postings materialized (distinct + df both inside the one
    // checkpoint barrier; downstream consumers see already-capped postings)
    def variantC(): DataFrame = {
      val sh = graft.dedup.DedupOps.shingleDF(docs)
        .repartition(col("shingle"))
        .groupBy(col("shingle"), col("doc_id")).agg(count(lit(1)))
        .select("doc_id", "shingle")
        .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
        .where(col("df") <= cap).drop("df")
        .localCheckpoint()
      val bench = sh.join(benchIds, Seq("doc_id"))
        .select(col("doc_id").as("bench_doc_id"), col("shingle"))
      val corpus = sh.join(benchIds, Seq("doc_id"), "left_anti")
      corpus.join(bench, Seq("shingle"))
        .groupBy(col("doc_id"), col("bench_doc_id"))
        .agg(count(lit(1)).as("shared"))
        .where(col("shared") >= minShared)
        .orderBy("doc_id", "bench_doc_id")
    }

    // JIT warm-up at the smallest SF via the declared query
    graft.dedup.Contamination.contaminatedPairs(
      Tables.load(spark, "/root/testdata/sf0.001", "documents"),
      graft.sampling.Sampling.sampleByHash(
        Tables.load(spark, "/root/testdata/sf0.001", "documents"),
        "doc_id", 0.05, salt = "bench").select("doc_id"),
      minShared, Some(cap)).count()

    // Interleaved same-JVM repeats (VERDICT r14 #2: single readings at x50
    // swung 8-41 s across contexts; a variance verdict needs within-context
    // spread, and interleaving means a load burst hits all variants alike
    // instead of biasing whichever ran during it). Per-variant readings are
    // printed each round plus a min/median summary at the end.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val variants = Seq("A_current" -> (() => variantA()),
                       "B_hot_ckpt" -> (() => variantB()),
                       "C_capped_ckpt" -> (() => variantC()))
    val readings = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    def loadAvg(): Double =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").split("\\s+")(0).toDouble
      catch { case _: Exception => -1.0 }
    for (r <- 1 to reps; (name, mk) <- variants) {
      SparkEntry.clearCaches()
      spark.sharedState.cacheManager.clearCache()
      val lq = loadAvg()
      val t0 = System.nanoTime()
      val n = mk().count()
      val dt = (System.nanoTime() - t0) / 1e9
      readings(name) = readings(name) :+ dt
      println(f"[capped-exp] rep $r $name%-14s rows=$n%d  ${dt}%.2f s  (load $lq%.2f)")
    }
    for ((name, _) <- variants; ts = readings(name).sorted) {
      println(f"[capped-exp] SUMMARY $name%-14s min=${ts.head}%.2f s  " +
        f"median=${ts(ts.length / 2)}%.2f s  max=${ts.last}%.2f s  n=${ts.length}%d")
    }
    spark.stop()
  }
}
