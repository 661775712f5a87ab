package graft

import org.apache.spark.sql.SparkSession

/** A/B the profiler's adaptive low-cardinality strategy at bench scale:
  * the `smallScanBytes` cutoff (64 MB) currently routes sf0.1 lineitem
  * (11 MB) to the full-scan regex path; this measures whether the
  * low-card path (distinct-first, count-weighted pattern bank) would be
  * faster there — the crossover evidence for re-siting the cutoff.
  *
  * {{{
  * sbt -batch "Test/runMain graft.ProfileAdaptiveExperiment /root/testdata/sf0.1 lineitem 3"
  * }}}
  */
object ProfileAdaptiveExperiment {
  def main(args: Array[String]): Unit = {
    val dir   = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val table = if (args.length > 1) args(1) else "lineitem"
    val reps  = if (args.length > 2) args(2).toInt else 3
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = Tables.load(spark, dir, table)
    // warm both paths once (JIT + codegen)
    graft.stats.StatsPass.compute(Tables.load(spark, "/root/testdata/sf0.001", table))
    graft.stats.StatsPass.compute(
      Tables.load(spark, "/root/testdata/sf0.001", table),
      graft.stats.StatsPass.Config(smallScanBytes = 0))
    def time(cfg: graft.stats.StatsPass.Config): Double = {
      val t0 = System.nanoTime()
      graft.stats.StatsPass.compute(df, cfg)
      (System.nanoTime() - t0) / 1e9
    }
    val out = (1 to reps).map { _ =>
      val full = time(graft.stats.StatsPass.Config())
      val adap = time(graft.stats.StatsPass.Config(smallScanBytes = 0))
      (full, adap)
    }
    val fmt = out.map { case (f, a) => f"full=$f%.2f adaptive=$a%.2f" }.mkString("; ")
    println(s"""{"table":"$table","dir":"$dir","pairs":"$fmt"}""")
    spark.stop()
  }
}
