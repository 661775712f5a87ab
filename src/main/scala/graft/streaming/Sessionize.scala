package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization of the events stream — the custom-state
  * streaming operator family (`flatMapGroupsWithState`), with a batch
  * gap-and-island twin whose semantics are identical and DuckDB-oracled.
  *
  * A session is a maximal run of a user's events where consecutive gaps are
  * ≤ `gapSeconds`. All time math is integer microseconds (`unix_micros` /
  * `epoch_us`) — no float time, no engine divergence.
  *
  * Batch plan shape: one hash-shuffle on user_id, then window functions
  * (lag → island flag → running sum) and a per-(user, session) aggregate —
  * the standard scalable gap-and-island; per-user data need not fit in one
  * task's memory beyond the window sort.
  *
  * Streaming shape: `groupByKey(user).flatMapGroupsWithState` with
  * event-time timeout — state per user is ONE open session (constant size);
  * sessions close either by an explicit gap-exceeding event or by the
  * watermark passing the session end + gap (timeout), so state is bounded
  * and emission is exactly the batch semantics for closed sessions.
  */
object Sessionize {

  val DefaultGapSeconds = 1800L

  /** Batch sessionization: (user_id, session_idx, session_start/end in µs,
    * n_events), deterministically ordered.
    */
  def batchSessions(events: DataFrame, gapSeconds: Long = DefaultGapSeconds): DataFrame = {
    val t = unix_micros(col("ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val gapUs = gapSeconds * 1000000L
    graft.Tables.widen(events)
      .select(col("user_id"), col("event_id"), t.as("t"))
      .withColumn(
        "nf",
        when(lag(col("t"), 1).over(w).isNull || col("t") - lag(col("t"), 1).over(w) > gapUs, 1L)
          .otherwise(0L)
      )
      .withColumn("session_idx", sum(col("nf")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("t")).as("session_start"),
        max(col("t")).as("session_end"),
        count(lit(1)).as("n_events")
      )
      .orderBy("user_id", "session_idx")
  }

  def oracleBatchSessions(gapSeconds: Long = DefaultGapSeconds): String = {
    val gapUs = gapSeconds * 1000000L
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
       |flg AS (
       |  SELECT user_id, event_id, t,
       |    (CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > $gapUs THEN 1 ELSE 0 END) AS nf
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
       |sess AS (
       |  SELECT user_id, t,
       |    sum(nf) OVER (PARTITION BY user_id ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS session_idx
       |  FROM flg)
       |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       |  min(t) AS session_start, max(t) AS session_end, count(*) AS n_events
       |FROM sess GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin
  }

  // --- streaming (custom state) ---------------------------------------------

  /** `ts` carries the watermark (Spark requires the watermarked timestamp
    * column to remain in the grouped Dataset for event-time timeouts);
    * `tMicros` is the exact integer time the session math uses.
    */
  final case class SessionEvent(userId: Long, eventId: Long, tMicros: Long, ts: java.sql.Timestamp)
  final case class OpenSession(start: Long, end: Long, n: Long)
  final case class ClosedSession(userId: Long, sessionStart: Long, sessionEnd: Long, nEvents: Long)

  /** Per-user custom-state transition: merge the batch's events into the one
    * open session, emitting every session that closes (gap exceeded inside
    * the batch, or event-time timeout = watermark passed end + gap).
    */
  def sessionStateFn(gapSeconds: Long)(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[OpenSession]
  ): Iterator[ClosedSession] = {
    val gapUs = gapSeconds * 1000000L
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(ClosedSession(userId, s.start, s.end, s.n))
    }
    // Drop watermark-late rows explicitly: flatMapGroupsWithState does NOT
    // pre-filter them (unlike windowed aggs), and admitting one would mutate
    // a session the batch twin considers closed. getCurrentWatermarkMs is 0
    // on the first batch — no event is dropped before a watermark exists.
    val wmMicros = state.getCurrentWatermarkMs() * 1000L
    val sorted = events.toSeq.filter(_.tMicros >= wmMicros).sortBy(e => (e.tMicros, e.eventId))
    var open   = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    for (e <- sorted) {
      open match {
        case Some(s) if e.tMicros >= s.start - gapUs && e.tMicros - s.end <= gapUs =>
          // within one gap of the open session's interval on either side:
          // merge, min-tracking start for not-yet-late out-of-order events
          // (the batch twin sessions on sorted event time)
          open = Some(OpenSession(math.min(s.start, e.tMicros), math.max(s.end, e.tMicros), s.n + 1))
        case Some(s) if e.tMicros < s.start - gapUs =>
          // pre-session straggler MORE than a gap before the open session's
          // start: it belongs to an earlier session that the batch twin
          // would have formed. Emit it as its own closed session — an
          // approximation (a second straggler inside ITS gap window would
          // have merged with it in batch); exact parity under arbitrary
          // reordering requires buffering events until the watermark.
          closed += ClosedSession(userId, e.tMicros, e.tMicros, 1)
        case Some(s) =>
          closed += ClosedSession(userId, s.start, s.end, s.n)
          open = Some(OpenSession(e.tMicros, e.tMicros, 1))
        case None =>
          open = Some(OpenSession(e.tMicros, e.tMicros, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      // close when the watermark passes the session's gap horizon
      state.setTimeoutTimestamp(s.end / 1000L + gapSeconds * 1000L)
    }
    closed.result().iterator
  }

  /** Streaming sessionization over a watermarked event stream. Returns the
    * stream of CLOSED sessions (append semantics — a session emits exactly
    * once, when no future event can extend it).
    */
  def streamingSessions(
      events: DataFrame,
      gapSeconds: Long = DefaultGapSeconds
  ): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(
        col("user_id").cast("long").as("userId"),
        col("event_id").cast("long").as("eventId"),
        unix_micros(col("ts")).as("tMicros"),
        col("ts")
      )
      .as[SessionEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionStateFn(gapSeconds)
      )
  }
}
