package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Sessionize

/** Sessionization semantics: batch gap-and-island (cross-engine agreement is
  * covered by the sessions_events oracle) and the custom-state streaming
  * twin (flatMapGroupsWithState with event-time timeout).
  */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ts(h: Int, m: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private def us(h: Int, m: Int): Long = ts(h, m).getTime * 1000L

  test("batchSessions: gap splits, boundary gap does not") {
    val events = Seq(
      (ts(10, 0), 1L, 100L, "click", 1.0, Map("k" -> "v")),
      (ts(10, 20), 1L, 101L, "view", 1.0, Map("k" -> "v")),  // 20m ≤ 30m: same session
      (ts(10, 50), 1L, 102L, "view", 1.0, Map("k" -> "v")),  // exactly 30m: same session
      (ts(12, 0), 1L, 103L, "click", 1.0, Map("k" -> "v")),  // 70m gap: new session
      (ts(10, 5), 2L, 200L, "click", 1.0, Map("k" -> "v"))
    ).toDF("ts", "user_id", "event_id", "event_type", "value", "props")
    val rows = Sessionize.batchSessions(events).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx")) ->
        (r.getAs[Long]("session_start"), r.getAs[Long]("session_end"), r.getAs[Long]("n_events"))).toMap
    assert(rows.size == 3)
    assert(rows((1L, 1L)) == ((us(10, 0), us(10, 50), 3L)))
    assert(rows((1L, 2L)) == ((us(12, 0), us(12, 0), 1L)))
    assert(rows((2L, 1L)) == ((us(10, 5), us(10, 5), 1L)))
  }

  test("streamingSessions: custom state closes sessions by gap and by watermark timeout") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val stream = input.toDF().toDF("ts", "user_id", "event_id").withWatermark("ts", "10 minutes")
    val name = "graft_sessions_test"
    val q = Sessionize.streamingSessions(stream, gapSeconds = 1800)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // batch 1: an open session for user 1
      input.addData((ts(10, 0), 1L, 100L), (ts(10, 20), 1L, 101L))
      q.processAllAvailable()
      assert(spark.table(name).count() == 0) // nothing closed yet

      // batch 2: a far-future event closes the first session via the gap
      // and advances the watermark far past the first session's horizon
      input.addData((ts(14, 0), 1L, 102L))
      q.processAllAvailable()
      val closed1 = spark.table(name).as[Sessionize.ClosedSession].collect()
      assert(closed1.length == 1)
      assert(closed1(0) == Sessionize.ClosedSession(1L, us(10, 0), us(10, 20), 2L))

      // batch 3: advance the watermark beyond 14:00 + gap → the open session
      // closes by event-time TIMEOUT, with no further user-1 event
      input.addData((ts(16, 0), 99L, 900L))
      q.processAllAvailable()
      input.addData((ts(18, 0), 99L, 901L))
      q.processAllAvailable()
      val closed2 = spark.table(name).as[Sessionize.ClosedSession].collect()
        .filter(_.userId == 1L)
      assert(closed2.length == 2)
      assert(closed2.map(_.sessionStart).toSet == Set(us(10, 0), us(14, 0)))
    } finally {
      q.stop()
      spark.sql(s"DROP VIEW IF EXISTS $name")
    }
  }

  test("two stragglers inside one gap window merge into one island (batch parity)") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Long)]
    // generous lateness so the out-of-order stragglers are NOT watermark-late
    val stream = input.toDF().toDF("ts", "user_id", "event_id").withWatermark("ts", "3 hours")
    val name = "graft_sessions_straggler"
    val q = Sessionize.streamingSessions(stream, gapSeconds = 600)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // the open session starts at 12:00; then two stragglers from 9:30 and
      // 9:35 arrive out of order (inside the 3h lateness, clear of the
      // watermark boundary) — more than a gap before the open session,
      // within one gap of EACH OTHER. The r3 approximation emitted each as
      // its own 1-event session; batch merges them.
      input.addData((ts(12, 0), 1L, 1L))
      q.processAllAvailable()
      input.addData((ts(9, 30), 1L, 2L), (ts(9, 35), 1L, 3L))
      q.processAllAvailable()
      input.addData((ts(23, 0), 99L, 9L)) // watermark push seals everything
      q.processAllAvailable()
      val streamed = spark.table(name).as[Sessionize.ClosedSession].collect()
        .filter(_.userId == 1L)
        .map(s => (s.sessionStart, s.sessionEnd, s.nEvents)).toSet
      assert(streamed == Set((us(9, 30), us(9, 35), 2L), (us(12, 0), us(12, 0), 1L)))
    } finally {
      q.stop()
      spark.sql(s"DROP VIEW IF EXISTS $name")
    }
  }

  test("streaming closed sessions match the batch twin for the same events") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val stream = input.toDF().toDF("ts", "user_id", "event_id").withWatermark("ts", "5 minutes")
    val name = "graft_sessions_eq"
    val q = Sessionize.streamingSessions(stream, gapSeconds = 600)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      val evs = Seq(
        (ts(9, 0), 1L, 1L), (ts(9, 5), 1L, 2L), (ts(9, 30), 1L, 3L),
        (ts(9, 2), 2L, 4L), (ts(9, 40), 2L, 5L)
      )
      input.addData(evs: _*)
      q.processAllAvailable()
      input.addData((ts(12, 0), 3L, 9L)) // watermark push closes everything prior
      q.processAllAvailable()
      val streamed = spark.table(name).as[Sessionize.ClosedSession].collect()
        .filter(_.userId <= 2L)
        .map(s => (s.userId, s.sessionStart, s.sessionEnd, s.nEvents)).toSet
      val batchDf = evs
        .map { case (t, u, e) => (t, u, e, "x", 0.0, Map("k" -> "v")) }
        .toDF("ts", "user_id", "event_id", "event_type", "value", "props")
      val batch = Sessionize.batchSessions(batchDf, gapSeconds = 600).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start"),
          r.getAs[Long]("session_end"), r.getAs[Long]("n_events"))).toSet
      assert(streamed == batch)
    } finally {
      q.stop()
      spark.sql(s"DROP VIEW IF EXISTS graft_sessions_eq")
    }
  }
}
