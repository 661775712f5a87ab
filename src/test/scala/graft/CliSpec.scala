package graft

import org.scalatest.funsuite.AnyFunSuite

/** The `graft.Main profile <path>` CLI — the Spark-native twin of the
  * reference's declared-but-dangling `ai_pipeline.cli:main` console script
  * (`pyproject.toml:63-64`). The subcommand body is exercised against the
  * shared test session; `main`'s own session wiring mirrors Verify/Bench.
  */
class CliSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("profile subcommand prints one profiled row per column of a parquet table") {
    val table = Main.runProfile(spark, "/root/testdata/sf0.001/customer.parquet", summary = true)
    val rows = table.collect()
    val nCols = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").columns.length
    assert(rows.length == nCols, s"customer has $nCols columns, profiled ${rows.length}")
    val names = rows.map(_.getAs[String]("column_name")).toSet
    assert(names.contains("c_custkey") && names.contains("c_name"))
    // the classification itself comes out non-degenerate
    val types = rows.map(_.getAs[String]("data_type")).toSet
    assert(types.size > 1, s"degenerate single-type profile: $types")
  }

  test("aiProviders: empty by default, replay transcript first, HTTP only behind the full flag+key+endpoint+model gate") {
    assert(Main.aiProviders(Map.empty).isEmpty) // the zero-egress default: pattern-only
    // a replay transcript alone enables offline AI
    val tpath = java.nio.file.Files.createTempFile("graft_replay", ".json")
    java.nio.file.Files.writeString(tpath, """{"c_name": "{\"data_type\": \"text\"}"}""")
    val rOnly = Main.aiProviders(Map("GRAFT_AI_REPLAY" -> tpath.toString))
    assert(rOnly.map(_.name) == Seq("replay"))
    // fully-configured HTTP (flag+key+endpoint+model — no compiled-in wire
    // defaults) joins AFTER replay, in the reference's fixed priority
    val both = Main.aiProviders(Map(
      "GRAFT_AI_REPLAY"       -> tpath.toString,
      "GRAFT_AI_HTTP"         -> "1",
      "GRAFT_OPENAI_API_KEY"  -> "k",
      "GRAFT_OPENAI_ENDPOINT" -> "https://example.invalid/v1/chat",
      "GRAFT_OPENAI_MODEL"    -> "m-1",
      "GRAFT_CLAUDE_API_KEY"  -> "k",
      "GRAFT_CLAUDE_ENDPOINT" -> "https://example.invalid/v1/msg",
      "GRAFT_CLAUDE_MODEL"    -> "m-2"
    ))
    assert(both.map(_.name) == Seq("replay", "claude", "openai"))
    // key without the flag stays shut; flag+key without endpoint/model too
    assert(Main.aiProviders(Map("GRAFT_CLAUDE_API_KEY" -> "k")).isEmpty)
    assert(Main.aiProviders(Map("GRAFT_AI_HTTP" -> "1", "GRAFT_CLAUDE_API_KEY" -> "k")).isEmpty)
  }

  test("a bad GRAFT_AI_REPLAY path fails with a named, actionable message (ADVICE r9)") {
    val e = intercept[IllegalArgumentException](
      Main.aiProviders(Map("GRAFT_AI_REPLAY" -> "/nonexistent/replay.jsonl")))
    assert(e.getMessage.contains("GRAFT_AI_REPLAY unreadable: /nonexistent/replay.jsonl"))
  }

  test("readAny dispatches on extension: csv and jsonl round through the source layer") {
    val base = s"/tmp/graft_cli/${spark.sparkContext.applicationId}"
    import spark.implicits._
    val df = Seq((1L, "a@b.com"), (2L, "c@d.org")).toDF("id", "email")
    graft.io.Sources.writeCsv(df, s"$base/t.csv")
    graft.io.Sources.writeJsonl(df, s"$base/t.jsonl")
    assert(Main.readAny(spark, s"$base/t.csv").count() == 2)
    assert(Main.readAny(spark, s"$base/t.jsonl").count() == 2)
    assert(Main.readAny(spark, "/root/testdata/sf0.001/region.parquet").count() == 5)
  }
}
