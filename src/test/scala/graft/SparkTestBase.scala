package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test JVM. */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config(
        "spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString
      )
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // The fuzz/sweep suites drive the documented bounded-global-window
    // operator sites (grep bounded-global-window in main) and test-side
    // reference pipelines on deliberately tiny corpora, where WindowExec's
    // single-partition warning is by-construction noise. Mute it HERE only —
    // Bench/Verify keep the default logger, so an unbounded global window
    // sneaking into a declared plan still warns where it matters.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    s
  }
}
