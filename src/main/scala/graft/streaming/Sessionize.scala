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
  * event-time timeout — state per user is the set of open session ISLANDS
  * (normally one; stragglers within the allowed lateness open earlier ones,
  * so the count is bounded by lateness/gap, never per-event). An island
  * closes when the watermark passes its end + gap (by sealing during event
  * processing or by event-time timeout); emission is exactly the batch
  * semantics for closed sessions under watermark-bounded disorder.
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
    // no widen() (r19): first operator is the user-key window exchange over
    // a cheap projection — a round-robin pre-shuffle would move every row
    // twice (guide §2.4; the EventOps.timed A/B measured the family −40%)
    events
      // the EventOps timed-event doctrine: an untimed event cannot be
      // sessionized, and NULL window-order placement differs across engines
      .where(col("ts").isNotNull)
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
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events
       |  WHERE ts IS NOT NULL),
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

  /** Per-user state: every session island not yet past its watermark
    * horizon, sorted by start. Usually exactly one element; out-of-order
    * stragglers can open earlier islands, bounded by (allowed lateness /
    * gap) — still constant-bounded state, never per-event buffering.
    */
  final case class OpenSessions(islands: Seq[OpenSession])
  final case class ClosedSession(userId: Long, sessionStart: Long, sessionEnd: Long, nEvents: Long)

  /** Per-user custom-state transition: merge the batch's events into the
    * open session ISLANDS, emitting every island the watermark has sealed
    * (no admissible future event can touch an island once the watermark
    * passes end + gap — a non-late event after that point is > gap away by
    * construction). Buffering stragglers as islands until their horizon
    * passes gives EXACT batch parity under watermark-bounded disorder (the
    * r3 approximation emitted each pre-session straggler immediately as a
    * 1-event session, permanently splitting sessions the batch twin merges).
    */
  def sessionStateFn(gapSeconds: Long)(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[OpenSessions]
  ): Iterator[ClosedSession] = {
    val gapUs = gapSeconds * 1000000L
    // getCurrentWatermarkMs is 0 on the first batch — nothing is sealed or
    // dropped before a watermark exists
    val wmMicros = state.getCurrentWatermarkMs() * 1000L

    def seal(islands: Seq[OpenSession]): (Seq[OpenSession], Seq[OpenSession]) =
      islands.partition(s => s.end + gapUs < wmMicros) // (closed, still open)

    def park(live: Seq[OpenSession]): Unit =
      if (live.isEmpty) { if (state.exists) state.remove() }
      else {
        state.update(OpenSessions(live.sortBy(s => (s.start, s.end))))
        // wake when the watermark passes the EARLIEST island's gap horizon;
        // must be strictly beyond the current watermark (ms truncation of a
        // boundary-equal horizon would otherwise throw)
        val horizonMs = live.map(s => s.end / 1000L + gapSeconds * 1000L).min
        state.setTimeoutTimestamp(math.max(horizonMs, state.getCurrentWatermarkMs() + 1L))
      }

    def emit(closed: Seq[OpenSession]): Iterator[ClosedSession] =
      closed.sortBy(s => (s.start, s.end))
        .map(s => ClosedSession(userId, s.start, s.end, s.n)).iterator

    if (state.hasTimedOut) {
      val (done, live) = seal(state.get.islands)
      park(live)
      return emit(done)
    }
    // Drop watermark-late rows explicitly: flatMapGroupsWithState does NOT
    // pre-filter them (unlike windowed aggs), and admitting one would mutate
    // a session the batch twin considers closed.
    val sorted = events.toSeq.filter(_.tMicros >= wmMicros).sortBy(e => (e.tMicros, e.eventId))
    var islands = state.getOption.map(_.islands).getOrElse(Seq.empty)
    for (e <- sorted) {
      // an event can bridge several islands (it is within one gap of each):
      // fold them all plus the event into one island
      val (touched, rest) = islands.partition(s =>
        e.tMicros >= s.start - gapUs && e.tMicros - s.end <= gapUs)
      val merged = touched.foldLeft(OpenSession(e.tMicros, e.tMicros, 1L)) { (acc, s) =>
        OpenSession(math.min(acc.start, s.start), math.max(acc.end, s.end), acc.n + s.n)
      }
      islands = merged +: rest
    }
    val (done, live) = seal(islands)
    park(live)
    emit(done)
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
