package graft

/** Writes the `explain("formatted")` output of named declared queries to
  * files — the optimization-round evidence trail (`plans/r<N>/<query>_before
  * .txt` / `..._after.txt`):
  *
  * {{{
  * sbt -batch "Test/runMain graft.PlanExplain plans/r19 before mad_lineitem ivfpq_topk_embeddings"
  * sbt -batch "Test/runMain graft.PlanExplain plans/r19 before @all"
  * }}}
  *
  * Runs at sf0.001 like [[PlanDump]]/[[SurfacePlans]] — plan SHAPE (exchange
  * count, join strategy, pushed filters) is scale-independent for this
  * surface; only AQE's runtime coalescing differs, and the dump captures the
  * pre-execution plan exactly as `df.explain("formatted")` prints it.
  */
object PlanExplain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanExplain <outDir> <suffix> <query name | @all> [more names]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkTestBase.spark
    val names =
      if (args.drop(2).contains("@all")) SparkEntry.queries.keys.toSeq.sorted
      else args.drop(2).toSeq
    for (name <- names) {
      val q = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      val df = q(spark, SurfacePlans.dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[PlanExplain] wrote ${outDir.resolve(s"${name}_$suffix.txt")}")
    }
    spark.stop()
  }
}
