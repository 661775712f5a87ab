package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CLI entry point — the Spark-native twin of the reference's declared (but
  * never built) console script `ai-pipeline = ai_pipeline.cli:main`
  * (`pyproject.toml:63-64` points at an empty module; the `api/`/`workers/`
  * packages are 0-byte stubs). One subcommand, matching what the reference's
  * pipeline actually does end-to-end: profile a dataset and print the
  * per-column classification table.
  *
  * Usage: `graft.Main profile <path> [--summary]`
  *   <path>      a parquet path/dir, .csv, or .jsonl file
  *   --summary   also print the dataset-level type/PII rollup
  *
  * Exit codes: 0 on success, 2 on usage error (the conventional CLI split —
  * a profile of an empty frame is a valid, empty table, not an error).
  */
object Main {

  private def usage(): Nothing = {
    System.err.println(
      """usage: graft.Main profile <path> [--summary]
        |  <path>    parquet path/dir, .csv file, or .jsonl file
        |  --summary also print the type/PII rollup""".stripMargin)
    sys.exit(2)
  }

  /** Extension-dispatched reader over the library's source layer. */
  private[graft] def readAny(spark: SparkSession, path: String): DataFrame = {
    val lower = path.toLowerCase(java.util.Locale.ROOT)
    if (lower.endsWith(".csv")) graft.io.Sources.readCsv(spark, path)
    else if (lower.endsWith(".jsonl") || lower.endsWith(".json")) graft.io.Sources.readJsonl(spark, path)
    else graft.io.Sources.readParquet(spark, path)
  }

  /** Provider chain for the CLI, mirroring the reference's env-keyed client
    * registry (`hybrid_classifier.py:65-87`) in the library's offline-first
    * order: an optional replay transcript (`GRAFT_AI_REPLAY=<path>`, always
    * socket-free) first, then any live HTTP vendors the operator explicitly
    * opted into (`GRAFT_AI_HTTP=1` + per-vendor key/endpoint/model) in the
    * reference's fixed claude→gemini→openai priority. Empty (the default
    * environment) → pattern-only, the reference's no-keys mode.
    */
  private[graft] def aiProviders(env: Map[String, String] = sys.env): Seq[graft.ai.AiProvider] = {
    val replay = env.get("GRAFT_AI_REPLAY").map { p =>
      try graft.ai.ReplayProvider.fromFile("replay", p)
      catch {
        case scala.util.control.NonFatal(e) =>
          throw new IllegalArgumentException(
            s"GRAFT_AI_REPLAY unreadable: $p (${e.getClass.getSimpleName}: ${e.getMessage})", e)
      }
    }
    val http = graft.ai.HttpProvider.Vendors.flatMap(v => graft.ai.HttpProvider.fromEnv(v, env))
    replay.toSeq ++ http
  }

  /** The env-driven engine choice shared by the CLI and [[graft.serve.ProfileServer]]:
    * any configured provider (replay or fully-gated HTTP) → hybrid, none (the
    * default, and always the zero-egress gate) → pattern-only. One factory so
    * the two surfaces cannot drift.
    */
  private[graft] def engineFor(
      providers: Seq[graft.ai.AiProvider]
  ): DataFrame => graft.model.ClassificationResult =
    if (providers.nonEmpty) {
      val h = new graft.hybrid.HybridEngine(
        graft.hybrid.HybridConfig(enableAi = true),
        Some(new graft.ai.AiClassifier(providers))
      )
      h.analyzeDataFrame
    } else {
      val e = new graft.engine.ProfilerEngine()
      e.analyzeDataFrame
    }

  /** The `profile` subcommand body, factored out of main so the spec can run
    * it against an existing session; returns the profile table it printed.
    * Runs the hybrid engine when any AI provider is configured in the
    * environment (replay or fully-configured gated HTTP), else pure pattern.
    */
  private[graft] def runProfile(spark: SparkSession, path: String, summary: Boolean): DataFrame = {
    val result = engineFor(aiProviders())(readAny(spark, path))
    val table  = graft.engine.ProfilerEngine.profilesToDF(spark, result.columnProfiles)
    println(s"Profile of $path (${result.columnProfiles.size} columns, " +
      f"method=${result.classificationMethod}, overall confidence=${result.overallConfidence}%.2f):")
    table.show(numRows = 1000, truncate = false)
    if (summary) {
      println("Summary:")
      graft.engine.ProfilerEngine.summaryFromProfiles(spark, result.columnProfiles)
        .show(numRows = 1000, truncate = false)
    }
    table
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "profile" :: path :: rest if rest.forall(_ == "--summary") && path.nonEmpty =>
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName("graft-cli")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try runProfile(spark, path, summary = rest.contains("--summary"))
      finally spark.stop()

    case _ => usage()
  }
}
