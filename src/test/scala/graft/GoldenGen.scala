package graft

/** Regenerates the golden profile files GoldenProfileSpec compares against
  * (SURVEY §5.2 item 4): `sbt "Test/runMain graft.GoldenGen"` after an
  * INTENTIONAL cascade change, then review the diff like any other code —
  * the goldens make an unintentional classification change visible in
  * review even when it is self-consistent enough to survive the oracle.
  */
object GoldenGen {
  val tables: Seq[String] = Tables.oracleProfiled

  def goldenLines(spark: org.apache.spark.sql.SparkSession, table: String): Seq[String] = {
    val engine = new graft.engine.ProfilerEngine()
    val profiles = engine.analyzeDataFrame(Tables.load(spark, "/root/testdata/sf0.001", table))
    graft.engine.ProfilerEngine
      .profilesToDF(spark, profiles.columnProfiles)
      .toJSON
      .collect()
      .toSeq // already ordered by column_name
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    val dir = java.nio.file.Paths.get("src/test/resources/goldens")
    java.nio.file.Files.createDirectories(dir)
    tables.foreach { t =>
      val lines = goldenLines(spark, t)
      java.nio.file.Files.writeString(dir.resolve(s"$t.jsonl"), lines.mkString("", "\n", "\n"))
      println(s"golden: $t (${lines.size} columns)")
    }
    spark.stop()
  }
}
