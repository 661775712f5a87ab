package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.Assertions.fail

/** One construction-and-planning pass over the whole declared surface at
  * sf0.001, shared by the surface-wide nets ([[SurfacePlanHygieneSpec]],
  * [[ExchangeBudgetSpec]]) so the imperative queries' training/loop actions
  * run once per JVM. Construction is in sorted name order, so any
  * cross-query cache interaction from main's own persist sites is
  * deterministic.
  */
object SurfacePlans {

  val dir = "/root/testdata/sf0.001"

  lazy val frames: Map[String, DataFrame] = {
    val spark = SparkTestBase.spark
    val b = Map.newBuilder[String, DataFrame]
    for ((name, q) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df =
        try q(spark, dir)
        catch {
          case e: Throwable =>
            fail(s"query '$name' failed to plan at $dir: ${e.getMessage}", e)
        }
      b += name -> df
    }
    b.result()
  }

  lazy val plans: Map[String, String] =
    frames.map { case (n, df) => n -> df.queryExecution.executedPlan.toString }
}
