package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining over the order fact — "which part
  * pairs ship together": the association layer of the analytics surface
  * (recommendation candidates, bundling reports).
  *
  * Scale shape: the ONLY way this is tractable at 100 TB is to never form
  * the lineitem self-join. Instead:
  *
  *   1. one shuffle on the order key with `collect_set` (map-side combined,
  *      dedups repeated parts per order); per-order sets are bounded by the
  *      order's line count — a natural small constant in an order fact (≤7
  *      in TPC-H-shaped data) — so state per key is O(1);
  *   2. pair generation is a per-row ARRAY expression (`transform` ×
  *      `slice` over the sorted set) — quadratic only in the bounded order
  *      size, executed inside whole-stage codegen, no join, no shuffle;
  *   3. pair counting is a map-side-combinable groupBy on (part_a, part_b);
  *   4. top-K lands as TakeOrderedAndProject (per-partition heads + driver
  *      merge), never a global sort.
  *
  * The self-join formulation (the oracle) shuffles |lineitem| twice and
  * explodes on hot orders; this plan's exchanges carry one row per
  * (order) and one per (pair), both strictly smaller.
  */
object Basket {

  /** Top-`k` co-purchased part pairs with their order counts, ordered by
    * (count desc, part_a, part_b) — a total order, so the cut is
    * deterministic.
    */
  def copurchaseTopK(lineitem: DataFrame, k: Int = 100): DataFrame =
    copurchaseEdges(lineitem, minSupport = 1)
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(k)

  /** DuckDB twin: the classic distinct-items self-join — independent
    * formulation of the same pair counts.
    */
  def oracleCopurchaseTopK(k: Int = 100): String =
    s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pairs AS (
       |  SELECT i.l_partkey AS part_a, j.l_partkey AS part_b
       |  FROM items i JOIN items j
       |    ON i.l_orderkey = j.l_orderkey AND i.l_partkey < j.l_partkey)
       |SELECT part_a, part_b, count(*) AS n_orders
       |FROM pairs GROUP BY part_a, part_b
       |ORDER BY n_orders DESC, part_a, part_b LIMIT $k""".stripMargin

  /** Triangle count over the co-purchase graph (edges = part pairs sharing
    * ≥ `minSupport` orders): the graph-shape diagnostic of the association
    * structure — triangle-dense neighborhoods are bundles, not chance
    * pairings.
    *
    * Node-iterator with DEGREE ORIENTATION, the standard distributed
    * triangle algorithm: orient every edge from its lower-degree endpoint to
    * its higher-degree endpoint (ties by key), build wedges by joining the
    * oriented edge list with itself on the source, and close each wedge
    * against the oriented edges. Orientation bounds per-node out-degree by
    * O(√|E|) regardless of skew — the hub node that would generate a
    * quadratic wedge explosion in the naive ordering only ever appears as a
    * wedge ENDPOINT — which is what keeps the two shuffle joins balanced at
    * scale. Each triangle is counted exactly once (in its unique
    * degree-oriented form).
    */
  def triangleCount(lineitem: DataFrame, minSupport: Int = 2): DataFrame = {
    // materialize the (bounded) thresholded edge list once (r19): the plan
    // references it three times (degree rollup + both join sides), and each
    // reference re-executes the whole collect_set + pair-explosion pipeline
    // upstream — the scan/exchange budget measured 24 FileScans in the
    // un-checkpointed plan. |E| is the thresholded pair list (two longs per
    // row), safely materializable at any scale that can hold the wedge join.
    val edges = copurchaseEdges(lineitem, minSupport)
      .select("part_a", "part_b").localCheckpoint()

    val deg = edges
      .select(explode(array(col("part_a"), col("part_b"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("deg"))

    // orient each edge (lower degree, tie by key) -> (higher degree)
    val da = deg.select(col("node").as("part_a"), col("deg").as("deg_a"))
    val db = deg.select(col("node").as("part_b"), col("deg").as("deg_b"))
    // the oriented list is likewise read three ways (both wedge legs + the
    // closing lookup) — checkpoint it too, so the degree joins run once
    val oriented = edges
      .join(da, "part_a")
      .join(db, "part_b")
      .select(
        when(
          col("deg_a") < col("deg_b") ||
            (col("deg_a") === col("deg_b") && col("part_a") < col("part_b")),
          struct(col("part_a").as("src"), col("part_b").as("dst"))
        ).otherwise(struct(col("part_b").as("src"), col("part_a").as("dst"))).as("e")
      )
      .select(col("e.src"), col("e.dst"))
      .localCheckpoint()

    val e1 = oriented.select(col("src"), col("dst").as("u"))
    val e2 = oriented.select(col("src"), col("dst").as("v"))
    val wedges = e1
      .join(e2, "src")
      .where(col("u") < col("v"))
    // union is positional: the second leg lists (dst, src) IN ORDER so the
    // lookup set holds both directions of every oriented edge
    val closing = oriented
      .select(col("src").as("u"), col("dst").as("v"))
      .union(oriented.select(col("dst"), col("src")))

    wedges
      .join(closing, Seq("u", "v"), "leftsemi")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Thresholded co-purchase edge list (internal + spec surface). */
  def copurchaseEdges(lineitem: DataFrame, minSupport: Int): DataFrame = {
    // no widen() here (r19): the first operator is a key exchange, so a
    // round-robin pre-shuffle would move every row TWICE to parallelize a
    // trivial map-side partial (hash inserts); the heavy pair expansion
    // runs AFTER the order-key exchange, already cluster-wide. widen() is
    // for narrow inputs feeding heavy PER-ROW work before any exchange.
    val sets = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .where(size(col("parts")) >= 2)
    sets
      .select(
        explode(
          expr(
            "flatten(transform(parts, (x, i) -> " +
              "transform(slice(parts, i + 2, size(parts)), y -> struct(x AS part_a, y AS part_b))))"
          )
        ).as("p")
      )
      .select(col("p.part_a"), col("p.part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_orders"))
      .where(col("n_orders") >= minSupport)
  }

  /** DuckDB twin: undirected triangle = three mutually-connected canonical
    * edges with a < b < c — an independent closed-form count.
    */
  def oracleTriangleCount(minSupport: Int = 2): String =
    s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |edges AS (
       |  SELECT i.l_partkey AS a, j.l_partkey AS b
       |  FROM items i JOIN items j
       |    ON i.l_orderkey = j.l_orderkey AND i.l_partkey < j.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= $minSupport)
       |SELECT count(*) AS n_triangles
       |FROM edges e1 JOIN edges e2 ON e2.a = e1.a AND e2.b > e1.b
       |JOIN edges e3 ON e3.a = e1.b AND e3.b = e2.b""".stripMargin
}
