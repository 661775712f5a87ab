package graft.olap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classic multi-way-join OLAP reporting — the TPC-H-shaped queries a user
  * of an analytics engine runs against the warehouse star: fact⋈fact joins
  * on their keys, fixed-size dimensions broadcast, money arithmetic in
  * exact decimals (reference intent: the profiler feeds THESE queries; an
  * engine that can't run the revenue report isn't an analytics engine).
  *
  * Scale shape: lineitem⋈orders is the one genuinely large join — both
  * sides shuffle on the order key (AQE handles skew); orders⋈customer
  * shuffles on the customer key (customer scales with the corpus, so it is
  * NOT broadcast — Catalyst/AQE may still choose to when a filtered side
  * fits); nation is a fixed ≤25-row dimension and is broadcast explicitly.
  * Aggregates ride map-side partial combine on low-cardinality keys.
  *
  * Money convention (`NumericStats.scala:321`): inputs cast to
  * DECIMAL(19,2) — exact for the 2-decimal testdata, width 19 so DuckDB
  * backs the product with int128 — revenue terms
  * `price · (1 − discount)` are exact DECIMAL(38,4), sums are declared as
  * the fixed-scale string rendering (float summation is order-dependent and
  * forbidden).
  */
object Reporting {

  /** Exact per-row revenue term: `l_extendedprice · (1 − l_discount)` in
    * DECIMAL(19,2)×DECIMAL(19,2) → DECIMAL(38,4). The discount complement is
    * re-cast to (19,2) — lossless, its value has scale 2 — because a
    * (20,2)×(19,2) product would need width 39, which DuckDB cannot
    * represent (its DECIMAL caps at 38).
    */
  private def revenueTerm: Column =
    col("l_extendedprice").cast("decimal(19,2)") *
      (lit(1).cast("decimal(19,2)") - col("l_discount").cast("decimal(19,2)")).cast("decimal(19,2)")

  private val OracleRevenueTerm =
    "CAST(l_extendedprice AS DECIMAL(19,2)) * CAST(1 - CAST(l_discount AS DECIMAL(19,2)) AS DECIMAL(19,2))"

  /** Revenue by customer nation (TPC-H Q5 shape): lineitem⋈orders⋈customer
    * ⋈nation, grouped by nation name. Emits exact item counts and the
    * decimal revenue rendering, ordered by nation.
    */
  def revenueByNation(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame
  ): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(revenueTerm).cast("decimal(38,4)").cast("string").as("revenue_str")
      )
      .orderBy("n_name")

  def oracleRevenueByNation: String =
    s"""SELECT n_name, count(*) AS n_items,
       |  CAST(CAST(sum($OracleRevenueTerm) AS DECIMAL(38,4)) AS VARCHAR) AS revenue_str
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Top-N customers by revenue (TPC-H Q10 shape). The limit makes the
    * global order a TakeOrderedAndProject — per-partition top-N heaps merged
    * at the driver, never a full sort-exchange of the aggregate (the
    * DSIR-cut pattern, `text/TextOps.scala`). Ordering is on the EXACT
    * decimal revenue (ties broken by key) so both engines rank identically;
    * the declared column is its string rendering.
    */
  def topCustomers(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      n: Int = 20
  ): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(sum(revenueTerm).cast("decimal(38,4)").as("__rev"))
      .orderBy(col("__rev").desc, col("c_custkey"))
      .limit(n)
      .select(col("c_custkey"), col("c_name"), col("__rev").cast("string").as("revenue_str"))

  def oracleTopCustomers(n: Int = 20): String =
    s"""SELECT c_custkey, c_name, CAST(rev AS VARCHAR) AS revenue_str FROM (
       |  SELECT c_custkey, c_name,
       |    CAST(sum($OracleRevenueTerm) AS DECIMAL(38,4)) AS rev
       |  FROM lineitem
       |  JOIN orders   ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  GROUP BY c_custkey, c_name)
       |ORDER BY rev DESC, c_custkey LIMIT $n""".stripMargin

  /** Top-N customers WITHIN each nation by exact revenue — the per-group
    * leaderboard. Unlike [[topCustomers]]'s single global TakeOrdered, the
    * per-group rank-limit plans as a two-phase WindowGroupLimit (the quota
    * / CDC-compaction shape, `PLANS.md` §13/§19): every input partition
    * forwards at most `n` candidate rows per nation BEFORE the shuffle, so
    * the exchange carries ≤ n·partitions rows per group — a nation with a
    * billion customers crosses the wire as n·P rows, never as itself.
    *
    * Determinism: ranking on the EXACT decimal revenue with a custkey
    * tiebreak is a total order, so both engines pick identical rows.
    */
  def topCustomersByNation(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame,
      n: Int = 3
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_custkey"))
      .agg(sum(revenueTerm).cast("decimal(38,4)").as("__rev"))
    rev
      .withColumn("rk",
        row_number().over(
          Window.partitionBy(col("n_name")).orderBy(col("__rev").desc, col("c_custkey"))))
      .where(col("rk") <= n)
      .select(col("n_name"), col("rk").cast("long").as("rk"),
        col("c_custkey"), col("__rev").cast("string").as("revenue_str"))
      .orderBy("n_name", "rk")
  }

  def oracleTopCustomersByNation(n: Int = 3): String =
    s"""SELECT n_name, CAST(rk AS BIGINT) AS rk, c_custkey,
       |  CAST(rev AS VARCHAR) AS revenue_str FROM (
       |  SELECT n_name, c_custkey, rev,
       |    row_number() OVER (PARTITION BY n_name ORDER BY rev DESC, c_custkey) AS rk
       |  FROM (
       |    SELECT n_name, c_custkey,
       |      CAST(sum($OracleRevenueTerm) AS DECIMAL(38,4)) AS rev
       |    FROM lineitem
       |    JOIN orders   ON l_orderkey = o_orderkey
       |    JOIN customer ON o_custkey = c_custkey
       |    JOIN nation   ON c_nationkey = n_nationkey
       |    GROUP BY n_name, c_custkey))
       |WHERE rk <= $n ORDER BY n_name, rk""".stripMargin

  /** Ratio-to-report: each nation's exact revenue in integer
    * ten-thousandths (the revenue term has scale 4, so ×10⁴ per row is an
    * exact long product of price-cents · (100 − discount-cents)) and its
    * EXACT per-mille share of the corpus total. All arithmetic is integer:
    * the per-row term is a product of two longs ≤ 10⁹, partial sums ride
    * DECIMAL(38,0) (long sums wrap past ~10¹⁰ rows of max-price items —
    * decimal partials are exact at any scale, matching DuckDB's HUGEINT
    * accumulation), and the share is `1000·rev div total` — no float ever
    * appears, so the hash can't drift.
    *
    * Scale shape: one fact-join tree (the [[revenueByNation]] plan), a
    * |nations|-row aggregate, and a global-window total over those ≤25 rows.
    */
  def revenueShareByNation(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame
  ): DataFrame = {
    val termE4 =
      ((col("l_extendedprice").cast("decimal(19,2)") * 100).cast("long") *
        (lit(100L) - (col("l_discount").cast("decimal(19,2)") * 100).cast("long")))
        .cast("decimal(30,0)")
    val rev = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(termE4).cast("decimal(38,0)").as("rev_e4"))
    // bounded-global-window: the total rides a partition-less window over
    // the ALREADY-AGGREGATED |nations| rows (≤25 — a fixed dimension, not
    // corpus-sized). The former `rev.crossJoin(broadcast(rev.agg(...)))`
    // planned the whole fact-join tree TWICE (no subtree reuse across the
    // agg/broadcast boundary); the window keeps one tree (r19, guide §2.4).
    // Window SUM over DECIMAL(38,0) is the same exact integer sum the
    // aggregate form computed — value-identical total, `div` unchanged.
    import org.apache.spark.sql.expressions.Window
    rev
      .withColumn("total_e4",
        sum(col("rev_e4")).over(Window.partitionBy()).cast("decimal(38,0)"))
      .select(
        col("n_name"),
        col("rev_e4").cast("string").as("rev_e4_str"),
        expr("CAST((1000 * rev_e4) div total_e4 AS BIGINT)").as("share_millis"))
      .orderBy("n_name")
  }

  /** DuckDB twin of [[revenueShareByNation]] — the same integer algebra
    * with HUGEINT standing in for Spark's DECIMAL(38,0) accumulator; both
    * are exact 128-bit integer sums, and `//`/`div` agree on positive
    * operands.
    */
  def oracleRevenueShareByNation: String =
    s"""WITH r AS (
       |  SELECT n_name,
       |    sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(19,2)) * 100 AS BIGINT) *
       |             (100 - CAST(CAST(l_discount AS DECIMAL(19,2)) * 100 AS BIGINT))
       |        AS HUGEINT)) AS rev_e4
       |  FROM lineitem
       |  JOIN orders   ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation   ON c_nationkey = n_nationkey
       |  GROUP BY n_name),
       |t AS (SELECT sum(rev_e4) AS total_e4 FROM r)
       |SELECT n_name, CAST(rev_e4 AS VARCHAR) AS rev_e4_str,
       |  CAST((1000 * rev_e4) // total_e4 AS BIGINT) AS share_millis
       |FROM r CROSS JOIN t ORDER BY n_name""".stripMargin
}
