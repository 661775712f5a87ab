package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — attach to every left row the most recent right row at or
  * before its timestamp, per key: THE time-series enrichment operator
  * (market data, feature snapshots, slowly-changing dimensions) that Spark
  * has no built-in for. A naive formulation is a range join (quadratic per
  * key, or an expensive range-partitioned join); the scalable shape used
  * here is the classic union trick:
  *
  *   1. tag both inputs and UNION them — right rows sort BEFORE left rows
  *      at an equal timestamp (at-or-before semantics, inclusive);
  *   2. one window per key, ordered by (time, side, tieBreak), running
  *      `last(attr, ignoreNulls)` over the unbounded-preceding frame — each
  *      left row sees exactly the latest right row at or before it;
  *   3. keep the left rows.
  *
  * ONE shuffle on the key (the window exchange), partition size bounded by
  * a key's own history — no per-key quadratic work, no range-join
  * explosion. Ties among right rows with the same (key, time) resolve to
  * the HIGHEST `tieBreak` value (deterministic — required for the oracle;
  * pass a unique column). Left rows with no prior right row carry nulls
  * (left-join semantics; callers choose sentinels).
  */
object AsOfJoin {

  def asOf(
      left: DataFrame,
      leftKey: String,
      leftTime: String,
      right: DataFrame,
      rightKey: String,
      rightTime: String,
      attrs: Seq[String],
      tieBreak: String
  ): DataFrame = {
    require(attrs.nonEmpty, "asOf needs right-side attributes to carry")
    require(attrs.contains(tieBreak) || right.columns.contains(tieBreak),
      s"tieBreak '$tieBreak' must be a right-side column")
    val leftCols = left.columns.toSeq
    def nullAs(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType)

    val taggedRight = right
      // a right row with a NULL key or NULL time can never be "as of"
      // anything: equi-join semantics say NULL keys match nothing, and a
      // NULL time has no position on the timeline — but the WINDOW
      // formulation would group NULL keys into one partition and sort NULL
      // times FIRST (visible to every later left row via last-ignoreNulls),
      // silently diverging from the lateral-join oracle (r11 sweep)
      .where(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
      (Seq(
        col(rightKey).cast("long").as("__k"),
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        col(tieBreak).as("__tie")
      ) ++ attrs.map(a => col(a).as(s"__a_$a"))
        ++ leftCols.map(c => nullAs(left, c).as(c))): _*
    )
    val taggedLeft = left.select(
      (Seq(
        col(leftKey).cast("long").as("__k"),
        col(leftTime).as("__t"),
        lit(1).as("__side"),
        nullAs(right, tieBreak).as("__tie")
      ) ++ attrs.map(a => nullAs(right, a).as(s"__a_$a"))
        ++ leftCols.map(col)): _*
    )
    // right rows first at equal time (inclusive at-or-before); among equal
    // (time, side=right) the highest tieBreak wins because `last` sees it
    // latest. Left rows carry null attrs, so their relative order at equal
    // sort keys cannot change any left row's result.
    val w = Window
      .partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = attrs.map(a => last(col(s"__a_$a"), ignoreNulls = true).over(w).as(s"asof_$a"))
    taggedRight
      .unionByName(taggedLeft)
      .select((col("__side") +: leftCols.map(col)) ++ filled: _*)
      .where(col("__side") === 1)
      .drop("__side")
  }

  /** The declared instance: every event enriched with the user's most
    * recent at-or-before order (latest o_orderdate; highest o_orderkey on
    * a same-day tie — 32 such ties exist at sf0.01, so the tie rule itself
    * is hash-checked). Events with no prior order would carry the -1/0.0
    * sentinels (none exist in the testdata: all orders predate all events).
    */
  def ordersAsOf(events: DataFrame, orders: DataFrame): DataFrame =
    asOf(
      events.select("event_id", "user_id", "ts"),
      leftKey = "user_id", leftTime = "ts",
      orders, rightKey = "o_custkey", rightTime = "o_orderdate",
      attrs = Seq("o_orderkey", "o_totalprice"), tieBreak = "o_orderkey"
    )
      .select(
        col("event_id"),
        col("user_id"),
        coalesce(col("asof_o_orderkey"), lit(-1L)).as("asof_orderkey"),
        coalesce(col("asof_o_totalprice"), lit(0.0)).as("asof_totalprice")
      )
      .orderBy("event_id")

  /** DuckDB ground truth: greatest-prior-row per event with the explicit
    * (o_orderdate DESC, o_orderkey DESC) tie rule — deliberately NOT the
    * native ASOF JOIN sugar, whose row choice among equal-timestamp matches
    * is unspecified.
    */
  def oracleOrdersAsOf: String =
    s"""SELECT e.event_id, e.user_id,
       |  coalesce(o.o_orderkey, -1) AS asof_orderkey,
       |  coalesce(o.o_totalprice, 0.0) AS asof_totalprice
       |FROM events e LEFT JOIN LATERAL (
       |  SELECT o_orderkey, o_totalprice FROM orders
       |  WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
       |  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
       |) o ON TRUE
       |ORDER BY e.event_id""".stripMargin
}
