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
    val changed = when(
      lag(col(trackedCol), 1).over(byTime).isNull ||
        lag(col(trackedCol), 1).over(byTime) =!= col(trackedCol),
      1L
    ).otherwise(0L)
    val withEp = graft.Tables.widen(df)
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
       |    (CASE WHEN lag($trackedCol) OVER w IS NULL
       |               OR lag($trackedCol) OVER w != $trackedCol THEN 1 ELSE 0 END) AS chg
       |  FROM $table
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
}
