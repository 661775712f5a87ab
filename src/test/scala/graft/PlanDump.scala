package graft

/** Prints the executed plan of named declared queries at sf0.001 — the
  * hand tool behind the plan-net budgets when investigating a specific
  * query's exchange/scan structure:
  *
  * {{{
  * sbt -batch "Test/runMain graft.PlanDump contamination_capped_documents"
  * }}}
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <query name> [more names]")
    val spark = SparkTestBase.spark
    for (name <- args) {
      val q = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      println(s"==== $name ====")
      println(q(spark, SurfacePlans.dir).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
