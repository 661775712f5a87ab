package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoin

/** Stream-stream interval join: the streaming run (two watermarked file
  * sources, append-mode inner join with an event-time range predicate,
  * AvailableNow) must produce exactly the batch interval join's rows. The
  * declared query's cross-engine agreement rides the oracle gate; this spec
  * pins stream ≡ batch on the real sf0.001 file.
  */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("view_id"),
      r.getAs[Long]("user_id"), r.getAs[Long]("gap_us"))).toSeq

  test("streaming interval join over the sf0.001 events file ≡ the batch interval join") {
    val dir      = "/root/testdata/sf0.001"
    val streamed = rows(StreamJoin.streamingAttribution(spark, dir))
    val batch    = rows(StreamJoin.batchAttribution(Tables.load(spark, dir, "events")))
    assert(batch.nonEmpty) // 3 attribution pairs at sf0.001 — a vacuous pass would hide breakage
    assert(streamed == batch)
    // every gap respects the window and the ordering contract holds
    assert(batch.forall { case (_, _, _, gap) => gap >= 0L && gap <= StreamJoin.DefaultWindowSeconds * 1000000L })
    assert(batch == batch.sortBy(t => (t._1, t._2)))
  }
}
