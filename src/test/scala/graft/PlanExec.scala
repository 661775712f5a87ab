package graft

/** Prints the POST-EXECUTION adaptive plan of named declared queries — the
  * runtime truth [[PlanDump]]'s pre-execution dump cannot show: AQE's
  * exchange/stage reuse ([[org.apache.spark.sql.execution.ReusedExchangeExec]]
  * / `ReusedSubquery` / stage dedup) only appears after the query has run,
  * so a "duplicated subtree" in the initial plan may execute once. Used to
  * adjudicate which duplicate-looking plans actually re-scan at runtime
  * before restructuring them (r19 optimization protocol, guide §7.2).
  *
  * {{{
  * sbt -batch "Test/runMain graft.PlanExec cohorts_events source_kl_documents"
  * }}}
  *
  * Executes each query with the noop sink at sf0.001 (shape, not timing),
  * then prints the final `AdaptiveSparkPlan isFinalPlan=true` tree.
  */
object PlanExec {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanExec <query name> [more names]")
    val spark = SparkTestBase.spark
    for (name <- args) {
      val q = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      val df = q(spark, SurfacePlans.dir)
      // collect() executes THIS df's QueryExecution (a noop write would plan
      // its own, leaving this one at isFinalPlan=false); declared outputs
      // are bounded, so the driver pull is fine at sf0.001
      val n = df.collect().length
      println(s"==== $name (post-execution, $n rows) ====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
