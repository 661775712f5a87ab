package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the Deequ-style "checks"
  * layer a pipeline runs before it trusts a table (reference intent:
  * `/root/reference/README.md:2` data-quality positioning; the profiler
  * measures, this layer JUDGES against declared rules).
  *
  * Design: every rule is a (name, violation predicate) pair; the whole suite
  * is evaluated in ONE aggregate job — each rule becomes a conditional sum
  * over the same scan, the per-rule rows are unstacked from the single
  * aggregate row afterward. At 100 TB this is one pass over the table with
  * map-side partial aggregation and a 1-row exchange, regardless of how many
  * rules the suite carries; the referential rule rides the same scan through
  * a broadcast left join against the (small) dimension's key column. Adding
  * a rule adds an aggregate expression, never a scan.
  *
  * Cross-engine exactness: violation counts are conditional sums of 0/1
  * longs (cast to BIGINT in the oracle — DuckDB's sum returns HUGEINT);
  * `passed` is `violations = 0`, a boolean both engines render identically
  * (the `pass_gopher` precedent, `text/TextOps.scala`).
  */
object Checks {

  /** One declared constraint: `violation` must evaluate to 1L when the row
    * violates the rule and 0L otherwise (nulls count via explicit IS NULL
    * arms, never by 3-valued-logic accident).
    */
  final case class Rule(name: String, violation: Column, oracleViolation: String)

  /** The declared suite over `orders` (referential arm: `customer`).
    * `ref_key` is the broadcast-joined dimension key, null when the FK
    * dangles.
    */
  val OrdersRules: Seq[Rule] = Seq(
    Rule(
      "complete_custkey",
      when(col("o_custkey").isNull, 1L).otherwise(0L),
      "CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END"
    ),
    Rule(
      "nonneg_totalprice",
      when(col("o_totalprice").isNull || col("o_totalprice") < 0.0, 1L).otherwise(0L),
      "CASE WHEN o_totalprice IS NULL OR o_totalprice < 0.0 THEN 1 ELSE 0 END"
    ),
    Rule(
      "totalprice_cap_100k",
      when(col("o_totalprice") > 100000.0, 1L).otherwise(0L),
      "CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END"
    ),
    Rule(
      "status_domain",
      when(col("o_orderstatus").isNull || !col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L),
      "CASE WHEN o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END"
    ),
    Rule(
      "priority_format",
      when(col("o_orderpriority").isNull || !col("o_orderpriority").rlike("^[1-5]-[A-Z ]+$"), 1L)
        .otherwise(0L),
      "CASE WHEN o_orderpriority IS NULL OR NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$') THEN 1 ELSE 0 END"
    ),
    Rule(
      "ref_custkey_customer",
      when(col("ref_key").isNull, 1L).otherwise(0L),
      "CASE WHEN ref_key IS NULL THEN 1 ELSE 0 END"
    )
  )

  /** Evaluate a rule suite in one aggregate pass. Output one row per rule —
    * (rule, n_rows, violations, passed) — plus the `unique_<keyCol>` rule
    * computed from the same aggregate's count distinct. Ordered by rule.
    *
    * The uniqueness rule cannot be a per-row predicate (it is a property of
    * the key's multiset), so it is folded into the SAME aggregate as
    * `count(*) - count(DISTINCT key)`: one distinct aggregate alongside the
    * conditional sums — Spark plans a single two-phase distinct aggregate,
    * no Expand (that only appears with MULTIPLE distincts).
    */
  def ruleReport(facts: DataFrame, dimKeys: DataFrame, fkCol: String, keyCol: String, rules: Seq[Rule]): DataFrame = {
    val joined = graft.Tables.widen(facts)
      .join(broadcast(dimKeys.withColumnRenamed(dimKeys.columns.head, "ref_key")),
            col(fkCol) === col("ref_key"), "left")
    val aggs =
      count(lit(1)).as("__n") +:
        (count(lit(1)) - countDistinct(col(keyCol))).as(s"unique_$keyCol") +:
        rules.map(r => sum(r.violation).as(r.name))
    val row = joined.agg(aggs.head, aggs.tail: _*)
    val names = s"unique_$keyCol" +: rules.map(_.name)
    val stackArgs = names.map(n => s"'$n', `$n`").mkString(", ")
    row
      .selectExpr(s"stack(${names.size}, $stackArgs) AS (rule, violations)", "__n AS n_rows")
      .select(col("rule"), col("n_rows"), col("violations"), (col("violations") === 0L).as("passed"))
      .orderBy("rule")
  }

  /** The declared suite: orders checked against [[OrdersRules]] with the
    * customer referential arm.
    */
  def orderChecks(orders: DataFrame, customer: DataFrame): DataFrame =
    ruleReport(orders, customer.select(col("c_custkey")), "o_custkey", "o_orderkey", OrdersRules)

  /** Cross-table reconciliation: does the order header's total agree with
    * the TPC-H charge formula over its own line items,
    * `Σ extendedprice · (1−discount)(1+tax)`? One row out: order count,
    * headerless-orphan count (orders with NO items — a referential defect
    * the row-level FK rule can't see), exact- and within-5%-agreement
    * counts, and the exact decimal total of absolute drift. On clean TPC-H
    * data the agreement counts equal the order count; on this synthetic
    * corpus they expose that `o_totalprice` is independent of the items —
    * which is precisely the finding an audit exists to surface.
    *
    * Exactness: the per-item factor (1−d)(1+t) is a product of 2-decimal
    * values → exactly 4 decimals, cast losslessly to DECIMAL(9,4) so the
    * price product stays inside DuckDB's width-38 cap
    * ((19,2)×(9,4) → (29,6)); the drift sum is the (38,6) string rendering.
    * Scale shape: one map-side-combinable per-order aggregate of lineitem,
    * one key-shuffled left join from orders, one 1-row aggregate.
    */
  def orderItemsConsistency(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val factor = ((lit(1).cast("decimal(19,2)") - col("l_discount").cast("decimal(19,2)")) *
      (lit(1).cast("decimal(19,2)") + col("l_tax").cast("decimal(19,2)"))).cast("decimal(9,4)")
    val liSums = graft.Tables.widen(lineitem)
      .select(col("l_orderkey"), (col("l_extendedprice").cast("decimal(19,2)") * factor).as("chg"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("chg")).as("li_total"))
    val joined = orders
      .select(col("o_orderkey"), col("o_totalprice").cast("decimal(19,2)").as("header_total"))
      .join(liSums, col("o_orderkey") === col("l_orderkey"), "left")
    val diff = abs(col("header_total") - col("li_total"))
    joined.agg(
      count(lit(1)).as("n_orders"),
      sum(when(col("li_total").isNull, 1L).otherwise(0L)).as("n_no_items"),
      sum(when(diff < lit(new java.math.BigDecimal("0.01")), 1L).otherwise(0L)).as("n_exact_match"),
      // the zero-header guard keeps ANSI from raising DIVIDE_BY_ZERO on a
      // 0.00-total order (a zero-header order is never "within 5%"); DuckDB
      // yields NaN there, which the CASE also rejects — same rows counted
      sum(when(col("header_total") =!= 0 &&
          diff.cast("double") / col("header_total").cast("double") < 0.05, 1L).otherwise(0L))
        .as("n_within_5pct"),
      sum(diff).cast("decimal(38,6)").cast("string").as("sum_abs_diff_str")
    )
  }

  /** DuckDB twin of [[orderItemsConsistency]]. */
  def oracleOrderItemsConsistency: String =
    s"""WITH li AS (
       |  SELECT l_orderkey,
       |    sum(CAST(l_extendedprice AS DECIMAL(19,2)) *
       |        CAST((1 - CAST(l_discount AS DECIMAL(19,2))) *
       |             (1 + CAST(l_tax AS DECIMAL(19,2))) AS DECIMAL(9,4))) AS li_total
       |  FROM lineitem GROUP BY l_orderkey),
       |j AS (
       |  SELECT CAST(o.o_totalprice AS DECIMAL(19,2)) AS header_total, li.li_total
       |  FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey)
       |SELECT count(*) AS n_orders,
       |  CAST(sum(CASE WHEN li_total IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_no_items,
       |  CAST(sum(CASE WHEN abs(header_total - li_total) < 0.01 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_match,
       |  CAST(sum(CASE WHEN header_total <> 0
       |            AND CAST(abs(header_total - li_total) AS DOUBLE) / CAST(header_total AS DOUBLE) < 0.05
       |           THEN 1 ELSE 0 END) AS BIGINT) AS n_within_5pct,
       |  CAST(CAST(sum(abs(header_total - li_total)) AS DECIMAL(38,6)) AS VARCHAR) AS sum_abs_diff_str
       |FROM j""".stripMargin

  /** DuckDB twin of [[orderChecks]]: same broadcast-shaped left join, same
    * conditional sums, same stack-to-rows — expressed as one aggregate CTE
    * unpivoted by a UNION ALL of 1-column selects.
    */
  def oracleOrderChecks: String = {
    val sums = OrdersRules
      .map(r => s"CAST(sum(${r.oracleViolation}) AS BIGINT) AS ${r.name}")
      .mkString(",\n    ")
    val arms = ("unique_o_orderkey" +: OrdersRules.map(_.name))
      .map(n => s"SELECT '$n' AS rule, n_rows, $n AS violations FROM a")
      .mkString("\n  UNION ALL ")
    s"""WITH j AS (
       |  SELECT o.*, c.c_custkey AS ref_key
       |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
       |a AS (
       |  SELECT count(*) AS n_rows,
       |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS unique_o_orderkey,
       |    $sums
       |  FROM j)
       |SELECT rule, n_rows, violations, violations = 0 AS passed
       |FROM ($arms)
       |ORDER BY rule""".stripMargin
  }
}
