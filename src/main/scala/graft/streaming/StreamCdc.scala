package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming twin of [[graft.cdc.ChangeCapture]] — the CDC-apply run
  * CONTINUOUSLY: the changelog arrives as a stream, and the engine
  * maintains the latest-wins snapshot as a streaming aggregation
  * (`max_by(payload, seq)` per key). This is the materialized-view form of
  * MERGE INTO: every micro-batch folds its changes into per-key state;
  * tombstoned keys are filtered at read-out.
  *
  * State is BOUNDED by |live keys| × one payload struct — the aggregation
  * retains exactly the current winner per key, never the change history.
  * The declared run uses Complete output into a memory sink (every declared
  * query materializes its result by construction); a production deployment
  * uses Update mode + `foreachBatch` merging each batch's changed keys into
  * the lake table — the state shape and the per-batch fold are identical,
  * only the sink differs.
  *
  * Declared against the SAME DuckDB oracle as the batch twin
  * (`cdc_snapshot_orders`) — the stream≡batch agreement rule the other
  * declared streaming queries follow (`StreamJoin.scala`,
  * `StreamingMonitor.scala`).
  */
object StreamCdc {

  private val runCounter = new AtomicLong(0L)

  /** Number of shuffle partitions for the stateful aggregation — sized to
    * the stream, set on an isolated session clone so concurrent batch
    * planning on the shared session is unaffected (ADVICE r7).
    */
  val StreamShufflePartitions = 8

  /** Run the orders changelog through the streaming latest-wins aggregation
    * with AvailableNow, returning the final snapshot — identical rows to
    * [[graft.cdc.ChangeCapture.cdcSnapshotOrders]].
    */
  def streamingCdcSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val schema = graft.Tables.load(spark, dir, "orders").schema

    val sess = StreamSession.cloned(spark, StreamShufflePartitions)

    // the changelog projection is the batch twin's OWN, not an inline copy:
    // both declared queries share one oracle, so the key/seq mapping and the
    // tombstone predicate must be one body (r11 review)
    val changes = graft.cdc.ChangeCapture.ordersChangelog(
      sess.readStream
        .schema(schema)
        .option("pathGlobFilter", "orders.parquet")
        .parquet(dir))

    val snapshot = changes
      .groupBy(col("o_custkey"))
      .agg(
        max_by(
          struct(col("seq"), col("op"), col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority")),
          col("seq")
        ).as("w")
      )

    val name = s"graft_stream_cdc_${runCounter.incrementAndGet()}"
    val q = snapshot.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    sess.table(name)
      .where(col("w.op") =!= "D")
      .select(
        col("o_custkey"), col("w.seq").as("last_seq"),
        col("w.o_orderstatus").as("o_orderstatus"),
        col("w.o_totalprice").as("o_totalprice"),
        col("w.o_orderpriority").as("o_orderpriority")
      )
      .orderBy("o_custkey")
  }
}
