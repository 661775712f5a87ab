package graft

import org.apache.spark.sql.SparkSession

/** Scale-rehearsal main: time a SELECTED set of declared queries against a
  * tiled testdata dir (`tools/scale_tile.py` builds x1/x5/x20 tiles of
  * sf0.1). This is the measured point behind the 100 TB plan-shape argument:
  * scan-bound queries should scale ~linearly in tile factor, scheduling-
  * floor-dominated ones well below linearly, and anything super-linear is a
  * plan bug to fix or explain (BASELINE.md records the curve).
  *
  * Usage: `runMain graft.ScaleBench <dir> <q1,q2,...>` — prints ONE JSON
  * line {"dir":..,"queries":{name:sec,..},"total":sec}. Single pass per
  * query (the rehearsal compares a query to ITSELF across tiles, so the
  * per-query noise band documented in BASELINE.md applies to both ends of
  * every ratio); producer queries run before their cache consumers, like
  * the bench.
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ScaleBench <sfDir> <comma-separated query names>")
    val dir = args(0)
    val requested = args(1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = requested.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the warm-up dir is guarded alongside the tile dir, same as Bench —
    // a testdata regen must fail as a named message, not an opaque mid-run error
    val warmDir = "/root/testdata/sf0.001"
    val drift = Seq(dir, warmDir).distinct.flatMap(d =>
      Tables.preflight(spark, d).map(m => s"$d: $m"))
    if (drift.nonEmpty) {
      drift.foreach(m => System.err.println(s"[scalebench] PREFLIGHT: $m"))
      spark.stop()
      sys.exit(2)
    }

    // JIT warm-up on the smallest SF (same code paths, negligible data)
    requested.foreach(n => SparkEntry.queries(n)(spark, warmDir).count())
    SparkEntry.clearCaches()

    // the bench's shared producer ordering; a consumer requested WITHOUT its
    // producer in the set still times train+query (fine for tile-vs-tile
    // self-comparison, but don't compare such a reading to a bench median)
    val producerFirst = SparkEntry.ProducerFirst
    val ordered = requested.sortBy(n => (if (producerFirst(n)) 0 else 1, n))
    val timings = ordered.map { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qJson = timings.map { case (n, t) => s""""$n":${math.round(t * 100) / 100.0}""" }.mkString(",")
    val total = math.round(timings.map(_._2).sum * 100) / 100.0
    println(s"""{"dir":"$dir","queries":{$qJson},"total":$total}""")
    spark.stop()
  }
}
