package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.analytics.EventOps
import graft.streaming.StreamingMonitor

/** The streaming anomaly monitor must agree with the DuckDB-oracled batch
  * twin on every SEALED day: same counts, same baseline depth, same
  * exact-integer z-decision. Sealing discipline (watermark passes the day's
  * end; late rows dropped; timeout flushes without new per-key data) is what
  * the streaming side adds — the scoring arithmetic is shared.
  */
class StreamingMonitorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // day 1-based: an event at exactly epoch 0 sits ON the initial watermark
  // boundary (a degenerate case no real feed produces) — keep off it
  private def ts(day: Int, i: Int) =
    new java.sql.Timestamp((day + 1).toLong * 86400000L + i * 1000L)

  test("streamingAnomalies: sealed days match the batch twin; spike flags via timeout flush") {
    implicit val sq = spark.sqlContext
    // the batch-spec fixture: type x flat 10/day then a 3× spike on day 10;
    // type y alternating 9/11 then 11 (inside ±3σ — must stay silent)
    val series = Seq(
      "x" -> (Seq.fill(10)(10) :+ 30),
      "y" -> (Seq.tabulate(10)(i => if (i % 2 == 0) 9 else 11) :+ 11)
    )
    val fixture = for {
      (tpe, counts) <- series
      (c, d)        <- counts.zipWithIndex
      i             <- 0 until c
    } yield (ts(d, i), tpe)

    val input  = MemoryStream[(java.sql.Timestamp, String)]
    val stream = input.toDF().toDF("ts", "event_type").withWatermark("ts", "1 second")
    val name   = "graft_monitor_test"
    val q = StreamingMonitor.streamingAnomalies(stream, windowDays = 28, z = 3, minBaseline = 7)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // batch 1: the whole series. The watermark is 0 DURING the batch, but
      // its advance (to mid-day-10 − 1s) triggers a follow-up microbatch
      // where the event-time TIMEOUT seals days 0-9 for x and y — day 10
      // stays open (the watermark sits inside it)
      input.addData(fixture: _*)
      q.processAllAvailable()
      assert(spark.table(name).count() == 20)
      assert(spark.table(name).where("day = 11").count() == 0) // spike day still open

      // batch 2: a WATERMARK-LATE event for x's still-open spike day (its ts
      // is below the batch-1 watermark, though day 10 has not sealed). The
      // engine drops it BEFORE the state fn runs (fMGWS under
      // EventTimeTimeout pre-filters late input) — this batch pins that
      // contract: the sealed count below stays 30, and batch-twin agreement
      // therefore assumes disorder bounded by the watermark delay
      input.addData((ts(10, 0), "x"))
      q.processAllAvailable()

      // batch 3: a far-future sentinel pushes the watermark past day 10's
      // end; x and y get NO new data — day 10 seals purely by timeout, and
      // the spike must flag
      input.addData((ts(40, 0), "zz"))
      q.processAllAvailable()

      val streamed = spark.table(name).as[StreamingMonitor.ScoredDay].collect()
        .filter(r => r.event_type == "x" || r.event_type == "y")
        .map(r => (r.event_type, r.day) -> ((r.n_events, r.baseline_n, r.is_anomaly)))
        .toMap
      assert(streamed.size == 22)
      assert(streamed(("x", 11L))._1 == 30L,
        "a watermark-late event is dropped by the engine even though its day was still open (the documented contract)")
      assert(streamed(("x", 11L))._3, "the sealed spike day must flag")

      // full-row agreement with the oracled batch twin on the WATERMARK-
      // BOUNDED fixture (the dropped late row excluded — agreement is
      // contracted only under disorder within the watermark delay)
      val batchDf = fixture.toDF("ts", "event_type")
        .withColumn("user_id", org.apache.spark.sql.functions.lit(1L))
      val batch = EventOps.dailyAnomalies(batchDf, windowDays = 28, z = 3, minBaseline = 7)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
        .toMap
      assert(streamed == batch)
    } finally {
      q.stop()
      spark.sql(s"DROP VIEW IF EXISTS $name")
    }
  }
}
