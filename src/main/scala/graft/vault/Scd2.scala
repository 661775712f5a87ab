package graft.vault

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 episode builder — the warehouse-modeling
  * companion to [[DataVault]] (the reference's declared-but-unbuilt
  * `core/generators/` surface names dimensional models next to vault ones).
  * Collapses an entity's change stream into validity episodes: consecutive
  * rows (in event-time order) carrying the SAME tracked attribute value merge
  * into one `[valid_from, valid_to)` row; `valid_to` is NULL on the current
  * episode — the standard gaps-and-islands construction.
  *
  * Plan shape: ONE hash exchange on the entity key feeds both windows (the
  * change-flag/lag pass and the episode lead pass share
  * `partitionBy(entityKey)`), then a map-side-combinable groupBy on
  * (entity, episode). Nothing wider than the input row ever shuffles, and
  * per-key state is a single running counter — the shape survives any number
  * of entities because no window partition exceeds one entity's history.
  *
  * Determinism: the in-key ordering includes the unique tie-break column, so
  * episode numbering is a pure function of the data (required for the hash
  * gate; SQL windows over non-unique orderings are not).
  */
object Scd2 {

  /** SCD2 episodes of `trackedCol` per `keyCol`, ordered by (`timeCol`,
    * `tieCol`). Output: key, episode (1-based), tracked value, valid_from,
    * valid_to (NULL = current), n_rows in the episode.
    */
  def episodes(
      df: DataFrame,
      keyCol: String,
      trackedCol: String,
      timeCol: String,
      tieCol: String
  ): DataFrame = {
    val byTime = Window.partitionBy(col(keyCol)).orderBy(col(timeCol), col(tieCol))
    // NULL-SAFE change detection: a NULL tracked value is its own value (it
    // opens and continues its own episode, SQL-GROUP-BY style). The lag
    // formulation (`lag.isNull || lag =!= cur`) silently merged a NULL-value
    // row into the PREVIOUS episode (NULL comparison → 0), creating
    // mixed-value episode numbers whose lead(valid_from) chain below was
    // then ordered by a NON-unique key — engine-dependent output (caught by
    // the r11 differential fuzz). row_number()=1 handles the first row,
    // where null-safe equality against the absent lag cannot.
    val changed = when(
      row_number().over(byTime) === 1 ||
        !(lag(col(trackedCol), 1).over(byTime) <=> col(trackedCol)),
      1L
    ).otherwise(0L)
    // no widen() (r19): first operator is the (key, time) window exchange
    // over a plain projection — the round-robin pre-shuffle was pure cost
    val withEp = df
      // timed-event doctrine (EventOps.timed): a change record without an
      // event time has no position in the validity history, and NULL
      // window-order placement differs across engines — excluded on both
      // sides (the oracle carries the same filter)
      .where(col(timeCol).isNotNull)
      .select(col(keyCol), col(trackedCol), col(timeCol), col(tieCol))
      .withColumn("episode", sum(changed).over(byTime))
    val byEp = Window.partitionBy(col(keyCol)).orderBy(col("episode"))
    withEp
      .groupBy(col(keyCol), col("episode"), col(trackedCol))
      .agg(min(col(timeCol)).as("valid_from"), count(lit(1)).as("n_rows"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byEp))
      .select(col(keyCol), col("episode"), col(trackedCol), col("valid_from"), col("valid_to"), col("n_rows"))
      .orderBy(keyCol, "episode")
  }

  /** The declared instance: order-priority episodes per customer over the
    * orders stream (o_orderkey is the unique tie-break).
    */
  def orderPriorityEpisodes(orders: DataFrame): DataFrame =
    episodes(orders, "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")

  def oracleOrderPriorityEpisodes: String =
    oracleEpisodes("orders", "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")

  /** DuckDB twin: identical windows, identical unique ordering. */
  def oracleEpisodes(
      table: String,
      keyCol: String,
      trackedCol: String,
      timeCol: String,
      tieCol: String
  ): String =
    s"""WITH flagged AS (
       |  SELECT $keyCol, $trackedCol, $timeCol, $tieCol,
       |    (CASE WHEN row_number() OVER w = 1
       |               OR lag($trackedCol) OVER w IS DISTINCT FROM $trackedCol
       |          THEN 1 ELSE 0 END) AS chg
       |  FROM $table
       |  WHERE $timeCol IS NOT NULL
       |  WINDOW w AS (PARTITION BY $keyCol ORDER BY $timeCol, $tieCol)),
       |numbered AS (
       |  SELECT *, sum(chg) OVER (PARTITION BY $keyCol ORDER BY $timeCol, $tieCol) AS episode
       |  FROM flagged),
       |eps AS (
       |  SELECT $keyCol, episode, $trackedCol,
       |    min($timeCol) AS valid_from, count(*) AS n_rows
       |  FROM numbered GROUP BY $keyCol, episode, $trackedCol)
       |SELECT $keyCol, CAST(episode AS BIGINT) AS episode, $trackedCol, valid_from,
       |  lead(valid_from) OVER (PARTITION BY $keyCol ORDER BY episode) AS valid_to,
       |  n_rows
       |FROM eps ORDER BY $keyCol, episode""".stripMargin

  // --- point-in-time (PIT) snapshot table ------------------------------------

  /** The declared PIT snapshot dates — mid-year marks inside the orders
    * stream's 1995–2001 range, so early snapshots exercise the
    * "entity not yet born" exclusion and late ones the open current episode.
    */
  val PitSnapshots: Seq[String] =
    Seq("1996-07-01", "1998-07-01", "2000-07-01", "2001-07-01")

  /** Data Vault 2.0 point-in-time table over the SCD2 episodes: for each
    * snapshot date, the episode in effect for every entity that exists by
    * then (`valid_from ≤ snap < valid_to`, NULL valid_to = still current) —
    * the construct a DV warehouse queries instead of re-running as-of logic
    * per report. Completes the generator family next to hub/sat/link and
    * the DDL text ([[DdlGen]]).
    *
    * Plan shape: the episode build is [[episodes]]' own single-exchange
    * plan; the snapshot join broadcasts a HANDFUL of literal dates against
    * it (a broadcast nested-loop by construction — the tiny-side pattern,
    * same as query-vector crossJoins; the predicate keeps ≤1 episode per
    * (entity, snapshot)). Never a shuffle keyed on the snapshot.
    */
  def pitTable(eps: DataFrame, keyCol: String, snapshots: Seq[String] = PitSnapshots): DataFrame = {
    val spark = eps.sparkSession
    import spark.implicits._
    val snaps = snapshots.toDF("snap").select(to_timestamp(col("snap")).as("snapshot_ts"))
    eps
      .join(
        broadcast(snaps),
        col("valid_from") <= col("snapshot_ts") &&
          (col("valid_to").isNull || col("snapshot_ts") < col("valid_to"))
      )
      .select(
        col("snapshot_ts"),
        col(keyCol),
        col("episode"),
        col("o_orderpriority"),
        col("valid_from")
      )
      .orderBy("snapshot_ts", keyCol)
  }

  /** The declared instance: PIT over [[orderPriorityEpisodes]]. */
  def pitOrders(orders: DataFrame): DataFrame =
    pitTable(orderPriorityEpisodes(orders), "o_custkey")

  /** DuckDB twin of [[pitOrders]]: the episodes oracle as a CTE joined to
    * the same literal snapshot list with the same validity predicate.
    */
  def oraclePitOrders(snapshots: Seq[String] = PitSnapshots): String = {
    val values = snapshots.map(s => s"(TIMESTAMP '$s 00:00:00')").mkString(", ")
    s"""WITH eps AS (SELECT * FROM ($oracleOrderPriorityEpisodes)),
       |snaps(snapshot_ts) AS (VALUES $values)
       |SELECT s.snapshot_ts, e.o_custkey, e.episode, e.o_orderpriority, e.valid_from
       |FROM eps e JOIN snaps s
       |  ON e.valid_from <= s.snapshot_ts AND (e.valid_to IS NULL OR s.snapshot_ts < e.valid_to)
       |ORDER BY s.snapshot_ts, e.o_custkey""".stripMargin
  }
}
