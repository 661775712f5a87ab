package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Damped PageRank over the behavioral transition graph — nodes are event
  * types, edges the (prev → next) session transitions with their observed
  * multiplicity as weight (the same lag-window relation as
  * [[EventOps.transitions]]). The classic "which state actually matters"
  * centrality a funnel report can't answer: retention tells you where users
  * go next, PageRank tells you where the steady-state attention mass sits.
  *
  * EXACT integer arithmetic end to end, so the hash gate holds cross-engine:
  * ranks live at scale 10¹² (`rank_e12`), the per-edge routed mass is
  * floor(r·w / out_w) computed by the long-safe split identity
  * `(r div out_w)·w + ((r mod out_w)·w) div out_w` (exact: r = q·out_w + s ⇒
  * floor(r·w/out_w) = q·w + floor(s·w/out_w)); the damping update is
  * `teleport + (85·Σ) div 100` with teleport = (15·10¹²) div (100·N). No
  * float appears anywhere — iteration order, partition order, and summation
  * order cannot move the result. The long bound is out_w·w < 9·10¹⁸
  * (out-weights here top out ~10⁵); past that the accumulators widen to
  * DECIMAL(38,0) unchanged in value. Dangling mass (types never followed)
  * drains per the strict-damping variant — documented, matched by the twin.
  *
  * Scale shape: building the edge relation is the ONE corpus-sized pass (a
  * per-user lag window, the [[EventOps.transitions]] plan); everything after
  * runs on |V| rank rows and |V|² aggregated edge rows. Each iteration
  * broadcasts the rank table onto the edge relation (at web scale edges are
  * the big side and stay put — ranks move to them), aggregates map-side per
  * dst, and rebuilds the |V|-row rank table. `iters` is fixed and small, so
  * the lineage stays shallow — no checkpointing needed.
  */
object PageRank {

  private val Scale = 1000000000000L // 10^12

  /** (event_type, rank_e12) after `iters` damped iterations, heaviest first.
    *
    * The two distributed passes (edge aggregation, node set) land in bounded
    * collects — ≤|V|² and |V| rows by construction — so the iteration loop
    * runs over driver-built local relations: no corpus recompute per
    * iteration, no cache residue. For graphs whose VERTEX SET is itself
    * corpus-sized (user-graph PageRank, not type-graph), the loop instead
    * keeps ranks distributed and broadcasts them onto the edges — the doc
    * header's shape; this entry point is the bounded-|V| variant.
    */
  def pageRank(spark: SparkSession, events: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 10, "pageRank wants 1..10 fixed iterations")
    import spark.implicits._
    val edgeRows = EventOps.transitions(events)
      .select(col("prev_type").as("src"), col("next_type").as("dst"), col("n").as("w"))
      .as[(String, String, Long)].collect().toSeq
    val nodeRows = graft.Tables.widen(events)
      .select(col("event_type")).distinct().as[String].collect().toSeq.sorted
    val n = nodeRows.length.toLong
    require(n > 0, "pageRank needs a non-empty graph")
    val teleport = (15L * Scale) / (100L * n)

    val edges = edgeRows.toDF("src", "dst", "w")
    val outW  = edges.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val nodes = nodeRows.toDF("node")

    var ranks = nodes.select(col("node"), lit(Scale / n).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(broadcast(outW), Seq("src"))
        .join(broadcast(ranks.withColumnRenamed("node", "src")), Seq("src"))
        .select(
          col("dst").as("node"),
          expr("(r div out_w) * w + ((r % out_w) * w) div out_w").as("c"))
        .groupBy(col("node"))
        .agg(sum(col("c")).as("cin"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"), expr(s"$teleport + (85 * coalesce(cin, 0)) div 100").as("r"))
    }
    ranks
      .select(col("node").as("event_type"), col("r").as("rank_e12"))
      .orderBy(col("rank_e12").desc, col("event_type"))
  }

  /** DuckDB twin of [[pageRank]] — the same integer update unrolled as a CTE
    * chain; `(r*w)//out_w` in BIGINT equals the Spark split form exactly (the
    * identity above), and `//` floors like `div` on positive operands.
    */
  def oraclePageRank(iters: Int = 3): String = {
    val base =
      s"""WITH seq AS (
         |  SELECT user_id, event_type,
         |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_type
         |  FROM events),
         |e AS (
         |  SELECT prev_type AS src, event_type AS dst, count(*) AS w
         |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
         |ow AS (SELECT src, sum(w) AS out_w FROM e GROUP BY src),
         |v AS (SELECT DISTINCT event_type AS node FROM events),
         |nn AS (SELECT count(*) AS n FROM v),
         |r0 AS (SELECT node, (SELECT $Scale // n FROM nn) AS r FROM v)""".stripMargin
    val steps = (1 to iters).map { i =>
      val prev = s"r${i - 1}"
      s"""c$i AS (
         |  SELECT e.dst AS node, sum(($prev.r * e.w) // ow.out_w) AS cin
         |  FROM e JOIN ow ON e.src = ow.src JOIN $prev ON $prev.node = e.src
         |  GROUP BY 1),
         |r$i AS (
         |  SELECT v.node,
         |    (SELECT (15 * $Scale) // (100 * n) FROM nn) + (85 * coalesce(c$i.cin, 0)) // 100 AS r
         |  FROM v LEFT JOIN c$i ON v.node = c$i.node)""".stripMargin
    }
    (Seq(base) ++ steps).mkString(",\n") +
      s"""
         |SELECT node AS event_type, CAST(r AS BIGINT) AS rank_e12
         |FROM r$iters ORDER BY rank_e12 DESC, event_type""".stripMargin
  }
}
