package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog compaction — the lakehouse MERGE/CDC-apply primitive: given a
  * stream of keyed change records (upserts and delete tombstones, each with
  * a monotone sequence number), materialize the latest-wins snapshot. This
  * is what Delta/Hudi/Iceberg `MERGE INTO` does per commit and what a CDC
  * consumer (Debezium → lake) runs continuously; here it is the batch
  * operator form.
  *
  * Semantics: per key, the record with the highest `seq` wins; if that
  * winner is a delete tombstone the key is absent from the snapshot.
  *
  * Scale shape: rank-1 selection via `row_number() <= 1`, the same
  * WindowGroupLimit form as [[graft.sampling.Sampling.quotaByHash]] — Spark
  * pushes the limit into a per-partition partial top-1 BEFORE the key
  * shuffle, so the exchange carries at most one candidate row per key per
  * input partition, never the key's full change history. A max_by aggregate
  * would shuffle whole payload structs through an ObjectHashAggregate; the
  * window form stays in whole-stage codegen and keeps the payload columns
  * flat.
  */
object ChangeCapture {

  /** Latest-wins snapshot of a changelog. `opCol` holds 'D' for delete
    * tombstones; anything else is an upsert. Ties on `seq` are broken by
    * nothing — callers must guarantee seq uniqueness per key (CDC readers
    * do: log offsets are unique).
    */
  def applyChangelog(changes: DataFrame, keyCol: String, seqCol: String, opCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
    // no widen() (r19): row_number's key-window exchange is the first
    // operator — nothing per-row to parallelize before it
    changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col(opCol) =!= "D")
      .drop("__rn")
  }

  /** The declared demo changelog over `orders`: key = o_custkey (the entity
    * being tracked), seq = o_orderkey (monotone, unique), op = 'D' when the
    * order is a finished one on a 1-in-7 keyed slice (a deterministic,
    * engine-portable tombstone predicate — 705 tombstones at sf0.01), else
    * upsert. The payload is the order's mutable attributes.
    */
  def ordersChangelog(orders: DataFrame): DataFrame =
    orders.select(
      col("o_custkey"),
      col("o_orderkey").as("seq"),
      when(col("o_orderstatus") === "F" && col("o_orderkey") % 7 === 0, "D").otherwise("U").as("op"),
      col("o_orderstatus"),
      col("o_totalprice"),
      col("o_orderpriority")
    )

  /** The declared snapshot: latest order state per customer, tombstoned
    * customers absent. Payload doubles pass through unaggregated (exact
    * value compare); ordered by key.
    */
  def cdcSnapshotOrders(orders: DataFrame): DataFrame =
    applyChangelog(ordersChangelog(orders), "o_custkey", "seq", "op")
      .select(col("o_custkey"), col("seq").as("last_seq"),
              col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy("o_custkey")

  /** DuckDB twin of [[cdcSnapshotOrders]]: identical window, identical
    * tombstone predicate.
    */
  def oracleCdcSnapshotOrders: String =
    s"""SELECT o_custkey, last_seq, o_orderstatus, o_totalprice, o_orderpriority FROM (
       |  SELECT o_custkey, o_orderkey AS last_seq, o_orderstatus, o_totalprice, o_orderpriority,
       |    CASE WHEN o_orderstatus = 'F' AND o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
       |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn
       |  FROM orders)
       |WHERE rn = 1 AND op <> 'D'
       |ORDER BY o_custkey""".stripMargin
}
