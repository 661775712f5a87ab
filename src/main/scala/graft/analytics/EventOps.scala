package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-analytics operators over the events stream — the funnel /
  * retention layer every event pipeline ships next to sessionization.
  * All time math is integer microseconds / integer days (no float time),
  * so results are engine-portable and order-free.
  *
  * Scale shapes:
  *  - [[funnel]] is a chain of per-user min-aggregates and equi-joins on
  *    user_id — each step is one hash-shuffle on the SAME key, so Spark
  *    reuses the partitioning across steps; no windows over unbounded
  *    partitions, no per-user state beyond one timestamp per step.
  *  - [[retention]] is one distinct on user/day grain plus a per-user
  *    window min (calendar-bounded partitions) — a single tree, no
  *    self-join (r19).
  */
object EventOps {

  private val MicrosPerDay = 86400000000L

  /** The timed-event domain every time-grain operator ranges over: rows with
    * a NULL `ts` are excluded on BOTH engines (each oracle carries the same
    * `ts IS NOT NULL`). An untimed event cannot be placed on any timeline —
    * and the engines DISAGREE on where NULL sorts in window ORDER BY (Spark
    * ascending puts nulls first, DuckDB last), so keeping such rows makes
    * every lag/session/trailing-window result engine-dependent and crashes
    * the watermark-driven streaming twins outright (r11 adversarial sweep).
    * [[propsStats]] alone stays on the raw table: it profiles payloads, not
    * the timeline.
    */
  // deliberately NOT widen()ed (r19): every consumer's first operator is an
  // exchange (groupBy/distinct/window) over a cheap projection — a
  // round-robin pre-shuffle would move every row twice to parallelize
  // near-zero map work (guide §2.4; the copurchase A/B measured the same
  // pattern at −20%). widen() is for narrow inputs feeding heavy PER-ROW
  // work (regex/tokenize/hash) before any exchange — in this file only
  // [[propsStats]] qualifies, and it widens its raw input itself.
  private def timed(events: DataFrame): DataFrame =
    events.where(col("ts").isNotNull)

  /** Ordered-step conversion funnel: a user converts step k iff they have
    * an event of step k's type STRICTLY after their step-(k-1) conversion
    * time, within `windowSeconds` of their FIRST-step time. Earliest
    * qualifying times are used throughout (the standard unordered-window
    * funnel definition). Output: (step, event_type, n_users), step 1-based.
    */
  def funnel(events: DataFrame, steps: Seq[String], windowSeconds: Long = 7L * 86400): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    val winUs = windowSeconds * 1000000L
    // ev materialized once; each step's survivors are localCheckpointed so
    // step k's join reads step k-1's materialized rows instead of
    // re-executing the whole prior join chain (O(S²) scans otherwise). The
    // counts themselves are NOT per-step actions: the S single-row count
    // aggregates over the checkpointed frames union into one plan collected
    // once (r3 ran S+1 count() actions and paid S+1 per-job floors).
    val ev = timed(events)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      .localCheckpoint()

    // per-user earliest chain: t_k = min t of step k with t > t_{k-1} ∧ t ≤ t_1 + window
    var converted: DataFrame = ev
      .where(col("event_type") === steps.head)
      .groupBy(col("user_id"))
      .agg(min(col("t")).as("t1"))
      .withColumn("tprev", col("t1"))
      .localCheckpoint()
    val stepFrames = scala.collection.mutable.ArrayBuffer(converted)
    for (k <- 1 until steps.size) {
      converted = ev
        .where(col("event_type") === steps(k))
        .join(converted, Seq("user_id"))
        .where(col("t") > col("tprev") && col("t") <= col("t1") + winUs)
        .groupBy(col("user_id"), col("t1"))
        .agg(min(col("t")).as("tk"))
        .withColumn("tprev", col("tk"))
        .drop("tk")
        .localCheckpoint()
      stepFrames += converted
    }
    val countPlan = stepFrames.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as("n_users")).select(lit(i + 1).as("step"), col("n_users"))
    }.reduce(_ unionAll _)
    val counts = countPlan.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    import spark.implicits._
    steps.indices
      .map(i => ((i + 1).toLong, steps(i), counts(i + 1)))
      .toDF("step", "event_type", "n_users")
      .orderBy("step")
  }

  /** DuckDB twin of [[funnel]] — the same chain as CTEs. */
  def oracleFunnel(steps: Seq[String], windowSeconds: Long = 7L * 86400): String = {
    val winUs = windowSeconds * 1000000L
    val s1 =
      s"""s1 AS (
         |  SELECT user_id, min(epoch_us(ts)) AS t1, min(epoch_us(ts)) AS tprev
         |  FROM events WHERE event_type = '${steps.head}' AND ts IS NOT NULL GROUP BY user_id)""".stripMargin
    val rest = (1 until steps.size).map { k =>
      s"""s${k + 1} AS (
         |  SELECT e.user_id, s$k.t1, min(epoch_us(e.ts)) AS tprev
         |  FROM events e JOIN s$k ON e.user_id = s$k.user_id
         |  WHERE e.event_type = '${steps(k)}' AND e.ts IS NOT NULL
         |    AND epoch_us(e.ts) > s$k.tprev AND epoch_us(e.ts) <= s$k.t1 + $winUs
         |  GROUP BY e.user_id, s$k.t1)""".stripMargin
    }
    val selects = steps.indices
      .map(k => s"SELECT ${k + 1} AS step, '${steps(k)}' AS event_type, (SELECT count(*) FROM s${k + 1}) AS n_users")
      .mkString("\nUNION ALL\n")
    s"""WITH ${(s1 +: rest).mkString(",\n")}
       |SELECT CAST(step AS BIGINT) AS step, event_type, CAST(n_users AS BIGINT) AS n_users
       |FROM ($selects) ORDER BY step""".stripMargin
  }

  /** Day-grain retention cohorts: cohort_day = a user's first active day
    * (µs-epoch integer-divided by 86400·10⁶), day_offset = active day −
    * cohort day; n_users = distinct users from the cohort active at that
    * offset (offset 0 = cohort size).
    *
    * PRECONDITION: non-negative event times (epoch 1970+). Spark `div`
    * truncates toward zero while DuckDB `//` floors, so the declared twin
    * agrees only on non-negative µs values — true of any real event stream
    * and of the testdata.
    */
  def retention(events: DataFrame): DataFrame = {
    // Single-tree form (r19, guide §2.4): cohort_day rides a per-user window
    // min over the SAME distinct activity relation instead of a self-join —
    // the join form planned the scan→distinct subtree twice (the legs
    // optimize differently, so not even AQE stage reuse can dedup them; see
    // plans/r19/retention_events_before.txt: 2 scans). The window's
    // partitions are one user's active DAYS (calendar-bounded), never raw
    // events. NULL user_id rows are dropped explicitly — the former inner
    // join dropped them implicitly (null never equi-joins), and the window
    // would otherwise invent n_users=0 groups the oracle does not have.
    val ev = timed(events)
      .where(col("user_id").isNotNull)
      .select(col("user_id"), expr(s"unix_micros(ts) div $MicrosPerDay").as("day"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    ev.withColumn("cohort_day", min(col("day")).over(w))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Day-grain activity with a trailing 7-day rolling event count per
    * event_type — the monitoring series behind ingest-volume alerting. The
    * rolling frame is a RANGE frame over the integer epoch-day (µs-epoch
    * integer-divided, same convention as [[retention]]), so calendar gaps
    * are handled by value, not by row position.
    *
    * Scale shape: one map-side-combinable (type, day) aggregate — the
    * distinct-user count isolates in an Expand over the same exchange —
    * then a window whose partitions are |event_type| series of |days| rows
    * each: the window input is the AGGREGATED relation, never raw events.
    */
  def rollingDaily(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val daily = timed(events)
      .select(col("event_type"), col("user_id"), expr(s"unix_micros(ts) div $MicrosPerDay").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"), count_distinct(col("user_id")).as("n_users"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    daily
      .withColumn("roll_events", sum(col("n_events")).over(w))
      .orderBy("event_type", "day")
  }

  def oracleRollingDaily(windowDays: Int = 7): String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_us(ts) // $MicrosPerDay AS day,
       |    count(*) AS n_events, count(DISTINCT user_id) AS n_users
       |  FROM events WHERE ts IS NOT NULL GROUP BY event_type, day)
       |SELECT event_type, day, n_events, n_users,
       |  CAST(sum(n_events) OVER (PARTITION BY event_type ORDER BY day
       |    RANGE BETWEEN ${windowDays - 1} PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_events
       |FROM daily ORDER BY event_type, day""".stripMargin

  /** Volume anomaly detection over the daily event stream: a day is
    * anomalous when its count deviates from the trailing baseline (the
    * previous `windowDays` OBSERVED days, current day excluded) by more than
    * `z` sample standard deviations, with at least `minBaseline` observations
    * before any day may fire.
    *
    * The z-test is evaluated in EXACT INTEGER algebra — the repo's
    * cross-engine convention forbids order-dependent float accumulation, and
    * a σ-comparison multiplies out to one: with m = |baseline|, S = Σn,
    * S2 = Σn², the condition |x − S/m| > z·σ (σ² sample variance) is
    *
    *   (m·x − S)² · (m−1)  >  z² · m · (m·S2 − S²)
    *
    * — counts are longs but the comparison terms are DECIMAL(38,0) on the
    * Spark side and HUGEINT on the DuckDB side: dev² = (m·x−S)² leaves long
    * range at a ~3× spike on a mere 10⁸/day baseline, where Spark (ANSI off)
    * would wrap silently while DuckDB raises. In 128-bit both engines stay
    * exact to ~10¹⁷ events/day/type. Scale shape: the
    * daily rollup is a map-side-combinable groupBy; the window runs over
    * |days| rows per event_type — years of history are thousands of rows per
    * key, so the per-key window never concentrates raw events.
    */
  def dailyAnomalies(
      events: DataFrame,
      windowDays: Int = 28,
      z: Int = 3,
      minBaseline: Int = 7
  ): DataFrame = {
    val daily = timed(events)
      .select(col("event_type"), expr(s"unix_micros(ts) div $MicrosPerDay").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-windowDays.toLong, -1L)
    val m  = count(lit(1)).over(w)
    // decimal(19,0) inputs so every product/sum is 128-bit-exact (the long
    // form wraps at dev² once a day deviates by >~3·10⁹ from baseline·m)
    val x  = col("n_events").cast("decimal(19,0)")
    val mD = m.cast("decimal(19,0)")
    val s  = sum(x).over(w)
    val s2 = sum(x * x).over(w)
    val dev = mD * x - s
    daily
      .withColumn("baseline_n", m)
      .withColumn(
        "is_anomaly",
        col("baseline_n") >= minBaseline &&
          dev * dev * (mD - 1) > lit(z.toLong * z) * mD * (mD * s2 - s * s)
      )
      .select(col("event_type"), col("day"), col("n_events"), col("baseline_n"), col("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** Semi-structured payload profiling: extract the JSON `k` field from the
    * `props` column (a JSON string — the usual shape of event payloads) and
    * aggregate it per event type. JSON path extraction is per-row and
    * codegen'd (`get_json_object`); the rollup is an ordinary partial
    * aggregate. Malformed/missing paths extract NULL and are counted, not
    * crashed on.
    */
  def propsStats(events: DataFrame): DataFrame = {
    // try_cast, not cast: a feed that ships "k": "not-a-number" must count
    // as a missing k (NULL), not throw ANSI CAST_INVALID_INPUT mid-scan —
    // TRY_CAST on the oracle side is the same contract
    val k = expr("try_cast(get_json_object(props, '$.k') AS long)")
    graft.Tables.widen(events) // raw table: payload profiling, not time-grain
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(k).as("n_with_k"),
        sum(k).as("sum_k"),
        min(k).as("min_k"),
        max(k).as("max_k"))
      .orderBy("event_type")
  }

  /** The json_valid guard mirrors Spark's lenient `get_json_object` (NULL on
    * malformed JSON, where DuckDB's json_extract_string raises); TRY_CAST
    * mirrors the Spark side's try_cast for non-numeric k values.
    */
  def oraclePropsStats: String =
    s"""WITH e AS (
       |  SELECT event_type,
       |    TRY_CAST(CASE WHEN json_valid(props)
       |                  THEN json_extract_string(props, '$$.k') END AS BIGINT) AS k
       |  FROM events)
       |SELECT event_type, count(*) AS n_events,
       |  count(k) AS n_with_k,
       |  CAST(sum(k) AS BIGINT) AS sum_k,
       |  min(k) AS min_k,
       |  max(k) AS max_k
       |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Markov transition counts over each user's event sequence — the
    * path-mining pass next to funnels: how often event type A is immediately
    * followed by B within one user's timeline. Ordering is (ts µs, event_id)
    * so simultaneous events transition deterministically on both engines.
    *
    * Scale shape: the lag window partitions by user_id over that user's own
    * events (bounded per key); the rollup is a map-side-combinable groupBy on
    * |types|² keys. No self-join of the event stream.
    */
  def transitions(events: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
    timed(events)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("t"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("prev_type", "next_type")
  }

  def oracleTransitions: String =
    s"""WITH seq AS (
       |  SELECT user_id, event_type,
       |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_type
       |  FROM events WHERE ts IS NOT NULL)
       |SELECT prev_type, event_type AS next_type, count(*) AS n
       |FROM seq WHERE prev_type IS NOT NULL
       |GROUP BY prev_type, next_type ORDER BY prev_type, next_type""".stripMargin

  /** DuckDB twin of [[dailyAnomalies]] — the identical integer inequality
    * over the identical trailing-rows frame. With `sealedDelayMs` set, the
    * output is restricted to days SEALED under a streaming watermark of that
    * delay (day end ≤ max event time truncated to ms minus the delay — the
    * [[graft.streaming.StreamingMonitor]] sealing rule), making this the
    * oracle of the declared streaming monitor run.
    */
  def oracleDailyAnomalies(
      windowDays: Int = 28,
      z: Int = 3,
      minBaseline: Int = 7,
      sealedDelayMs: Option[Long] = None
  ): String = {
    val sealFilter = sealedDelayMs
      .map(d => s"\n|WHERE (day + 1) * $MicrosPerDay <= " +
        s"(SELECT ((max(epoch_us(ts)) // 1000) - $d) * 1000 FROM events)")
      .getOrElse("")
    s"""WITH daily AS (
       |  SELECT event_type, epoch_us(ts) // $MicrosPerDay AS day, count(*) AS n_events
       |  FROM events WHERE ts IS NOT NULL GROUP BY event_type, day),
       |roll AS (
       |  SELECT event_type, day, n_events,
       |    count(*) OVER w AS m,
       |    sum(CAST(n_events AS HUGEINT)) OVER w AS s,
       |    sum(CAST(n_events AS HUGEINT) * n_events) OVER w AS s2
       |  FROM daily
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN $windowDays PRECEDING AND 1 PRECEDING)),
       |dd AS (
       |  SELECT *, CAST(m AS HUGEINT) * n_events - s AS dev FROM roll)
       |SELECT event_type, day, n_events, CAST(m AS BIGINT) AS baseline_n,
       |  (m >= $minBaseline AND
       |   dev*dev*(m-1) > ${z.toLong * z}*m*(m*s2 - s*s)) AS is_anomaly
       |FROM dd$sealFilter
       |ORDER BY event_type, day""".stripMargin
  }

  def oracleRetention: String =
    s"""WITH ev AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $MicrosPerDay AS day FROM events
       |  WHERE ts IS NOT NULL),
       |cohorts AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
       |SELECT c.cohort_day, e.day - c.cohort_day AS day_offset,
       |  count(DISTINCT e.user_id) AS n_users
       |FROM ev e JOIN cohorts c ON e.user_id = c.user_id
       |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin

  // --- volume trend (per-group least squares over aggregates) ---------------

  /** Per-type daily-volume TREND as exact least-squares aggregates — the
    * "is this source growing or dying" monitor next to the level-based
    * anomaly test: over the observed (day, count) points of each type,
    * publish m, Σt, Σy, Σty, Σt² and the slope's exact numerator/denominator
    * (slope = (m·Σty − Σt·Σy) / (m·Σt² − (Σt)²)). The repo convention after
    * the r7 unigram incident: never declare a rounded float quotient —
    * publish exact integer algebra and divide at the consumer.
    *
    * The slope products are computed in DECIMAL(38,0) (the z-test lesson,
    * ADVICE r7): with day ≈ 2·10⁴ and 100 TB-scale counts ≈ 10⁹/day over
    * years, m·Σty ≈ 2.6·10¹⁸ grazes Long.Max — Spark (ANSI off) would wrap
    * silently where DuckDB raises, so neither engine is allowed to compute
    * it in int64.
    *
    * Scale shape: daily rollup (map-side combinable), then a per-type
    * aggregate over |days| rows — the regression never sees raw events.
    */
  def volumeTrend(events: DataFrame): DataFrame = {
    val daily = timed(events)
      .select(col("event_type"), expr(s"unix_micros(ts) div $MicrosPerDay").as("t"))
      .groupBy(col("event_type"), col("t"))
      .agg(count(lit(1)).as("y"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    daily
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("m"),
        sum(col("t")).as("sum_t"),
        sum(col("y")).as("sum_y"),
        sum(col("t") * col("y")).as("sum_ty"),
        sum(col("t") * col("t")).as("sum_tt")
      )
      .select(
        col("event_type"), col("m"), col("sum_t"), col("sum_y"), col("sum_ty"), col("sum_tt"),
        (dec(col("m")) * dec(col("sum_ty")) - dec(col("sum_t")) * dec(col("sum_y")))
          .cast("decimal(38,0)").cast("string").as("slope_num_str"),
        (dec(col("m")) * dec(col("sum_tt")) - dec(col("sum_t")) * dec(col("sum_t")))
          .cast("decimal(38,0)").cast("string").as("slope_den_str")
      )
      .orderBy("event_type")
  }

  /** DuckDB twin of [[volumeTrend]] — same rollup, same DECIMAL(38,0)
    * products.
    */
  def oracleVolumeTrend: String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_us(ts) // $MicrosPerDay AS t, count(*) AS y
       |  FROM events WHERE ts IS NOT NULL GROUP BY event_type, t),
       |g AS (
       |  SELECT event_type, count(*) AS m,
       |    CAST(sum(t) AS BIGINT) AS sum_t, CAST(sum(y) AS BIGINT) AS sum_y,
       |    CAST(sum(t * y) AS BIGINT) AS sum_ty, CAST(sum(t * t) AS BIGINT) AS sum_tt
       |  FROM daily GROUP BY event_type)
       |SELECT event_type, m, sum_t, sum_y, sum_ty, sum_tt,
       |  CAST(CAST(CAST(m AS DECIMAL(38,0)) * sum_ty - CAST(sum_t AS DECIMAL(38,0)) * sum_y
       |       AS DECIMAL(38,0)) AS VARCHAR) AS slope_num_str,
       |  CAST(CAST(CAST(m AS DECIMAL(38,0)) * sum_tt - CAST(sum_t AS DECIMAL(38,0)) * sum_t
       |       AS DECIMAL(38,0)) AS VARCHAR) AS slope_den_str
       |FROM g ORDER BY event_type""".stripMargin

  // --- cumulative audience (running distinct without a running distinct) ------

  /** Cumulative distinct users per day — "how big is the audience so far".
    * The naive form (`count_distinct(user) OVER (ORDER BY day)`) re-counts
    * the whole user set per frame, and a per-day distinct union is a
    * scale-killer. The identity that removes it: a user contributes to day d
    * iff their FIRST day ≤ d — so one first-seen aggregate (map-combined
    * min per user), a |days|-row rollup of debuts, and a prefix sum over the
    * calendar-bounded day series give the exact running distinct. The only
    * window runs over |days| rows — the raw scan never sorts, and no state
    * ever holds a user set.
    */
  def cumulativeUsers(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val debuts = timed(events)
      .select(col("user_id"), expr(s"unix_micros(ts) div $MicrosPerDay").as("day"))
      .groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
      .groupBy(col("first_day").as("day")).agg(count(lit(1)).as("n_new"))
    debuts
      // bounded-global-window: the prefix sum needs one total order, and by
      // this point the relation is |days| rows (calendar-bounded — years,
      // not corpus) — WindowExec's single-partition WARN is expected and
      // harmless here; the raw event scan above never sorts.
      .withColumn("n_cum", sum(col("n_new")).over(
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy("day")
  }

  /** DuckDB twin of [[cumulativeUsers]]. */
  def oracleCumulativeUsers: String =
    s"""WITH debut AS (
       |  SELECT user_id, min(epoch_us(ts) // $MicrosPerDay) AS first_day
       |  FROM events WHERE ts IS NOT NULL GROUP BY user_id),
       |d AS (SELECT first_day AS day, count(*) AS n_new FROM debut GROUP BY 1)
       |SELECT day, CAST(n_new AS BIGINT) AS n_new,
       |  CAST(sum(n_new) OVER (ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_cum
       |FROM d ORDER BY day""".stripMargin

  // --- freshness (the staleness monitor) --------------------------------------

  /** Per-type data freshness: first/last event time and the lag behind the
    * corpus' newest event — the "did source X stop sending" check an ingest
    * SLA monitor runs before anything downstream trusts the data. A type
    * whose `lag_us` exceeds its expected cadence is stale even though every
    * row it DID send is valid — absence is the signal, the same doctrine as
    * the gap-filled spine.
    *
    * Scale shape: one map-combined min/max aggregate per type (exchange
    * carries |types| rows), the global max from a broadcast 1-row aggregate
    * of THAT relation — the raw scan happens once.
    */
  def freshness(events: DataFrame): DataFrame = {
    val perType = timed(events)
      .select(col("event_type"), expr("unix_micros(ts)").as("us"))
      .groupBy(col("event_type"))
      .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us"),
        count(lit(1)).as("n"))
    val newest = perType.agg(max(col("last_us")).as("newest_us"))
    perType.crossJoin(broadcast(newest))
      .select(col("event_type"), col("n"), col("first_us"), col("last_us"),
        (col("newest_us") - col("last_us")).as("lag_us"))
      .orderBy("event_type")
  }

  /** DuckDB twin of [[freshness]]. */
  def oracleFreshness: String =
    s"""WITH t AS (
       |  SELECT event_type, CAST(min(epoch_us(ts)) AS BIGINT) AS first_us,
       |    CAST(max(epoch_us(ts)) AS BIGINT) AS last_us, count(*) AS n
       |  FROM events WHERE ts IS NOT NULL GROUP BY event_type),
       |g AS (SELECT max(last_us) AS newest_us FROM t)
       |SELECT event_type, n, first_us, last_us,
       |  CAST(newest_us - last_us AS BIGINT) AS lag_us
       |FROM t CROSS JOIN g ORDER BY event_type""".stripMargin

  // --- inter-arrival gaps (cadence profile) -----------------------------------

  /** Per-type inter-arrival-time quantiles (seconds) — the cadence profile
    * that turns [[freshness]]'s lag into a judgment: a type whose median gap
    * is 2 s and whose lag is 10 min is DOWN; the same lag on a daily digest
    * type is routine. Gaps come from one lag-window pass per type (the
    * irreducible sort — sequence gaps need the sequence); tie ordering
    * doesn't matter because consecutive differences of a sorted multiset
    * are tie-invariant. The quantiles then run through the scale-safe
    * grouped rank-select pass ([[graft.stats.NumericStats.groupQuantiles]])
    * — never a per-group buffering percentile over the unbounded gaps.
    *
    * UNIT IS A DETERMINISM DECISION: gaps are declared in seconds
    * (`µs/1e6`, one identical IEEE division both engines), because the
    * pass's round-6 rendering is meaningless at µs magnitudes — a corpus
    * spanning years has gaps up to ~10¹⁰ µs, where adjacent doubles sit
    * >10⁻⁶ apart and the engines' round() paths snap to different
    * representables (caught live by the sf0.001 gate). At seconds
    * magnitude (≤10⁵) round-6 is 10⁶× inside double spacing.
    */
  def interArrival(events: DataFrame, qs: Seq[Double] = Seq(0.5, 0.95)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("us")
    // checkpoint the gap relation (narrow: type + one double) before the
    // rank-select kernel: the kernel scans its input once per refinement
    // round, and re-executing the lag window per round would triple the
    // window's shuffle cost (r19 — the kernel's own doc names this contract)
    val gaps = timed(events)
      .select(col("event_type"), expr("unix_micros(ts)").as("us"))
      .withColumn("gap_s",
        (col("us") - lag(col("us"), 1).over(w)).cast("double") / 1e6)
      .where(col("gap_s").isNotNull)
      .select(col("event_type"), col("gap_s"))
      .localCheckpoint()
    graft.stats.NumericStats.groupQuantiles(gaps, "event_type", Seq("gap_s"), qs)
      .select(col("grp").as("event_type"), col("q_r"), col("value_r"))
      .orderBy("event_type", "q_r")
  }

  /** DuckDB twin of [[interArrival]] — same lag window, same µs→s division,
    * same (n−1)·q interpolation, round-6 like the grouped rank-select pass
    * declares.
    */
  def oracleInterArrival(qs: Seq[Double] = Seq(0.5, 0.95)): String = {
    val branches = qs.map(q =>
      s"SELECT event_type, CAST($q AS DOUBLE) AS q_r, round(quantile_cont(gap_s, $q), 6) AS value_r FROM g GROUP BY event_type")
    s"""WITH s AS (
       |  SELECT event_type,
       |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY ts) AS gap_us
       |  FROM events WHERE ts IS NOT NULL),
       |g AS (SELECT event_type, CAST(gap_us AS DOUBLE) / 1e6 AS gap_s FROM s WHERE gap_us IS NOT NULL)
       |${branches.mkString("", "\nUNION ALL\n", "")}
       |ORDER BY event_type, q_r""".stripMargin
  }

  // --- robust trend (Theil–Sen over daily aggregates) -------------------------

  /** Theil–Sen robust slope of each type's daily volume — the median of all
    * pairwise (Δcount/Δday) slopes. The least-squares trend ([[volumeTrend]])
    * is exact but fragile: one backfill day or outage spike drags the fitted
    * slope arbitrarily; the pairwise-median slope tolerates up to ~29% wild
    * days, which is what an ingest-volume monitor actually faces.
    *
    * Scale shape: the raw scan collapses to the (type, day, count) rollup
    * FIRST (map-side combinable); the pair join and the median both run over
    * that aggregate, so the work is ∝ |types|·|days|² — calendar-bounded
    * (a decade of days ≈ 3.6k ⇒ ≤6.7M pairs per type), never a function of
    * the event count. At that bounded size the buffering `percentile`
    * aggregate is safe by construction — the raw-data quantile ban
    * (NumericStats §quantiles) is about unbounded columns, not
    * calendar-bounded pair sets.
    *
    * Cross-engine: slopes are single IEEE divisions of exact longs —
    * bit-identical both engines — and `percentile`/`quantile_cont` share
    * the (n−1)·q interpolation convention, so the round-6 median matches.
    */
  def theilSen(events: DataFrame): DataFrame = {
    val daily = timed(events)
      .select(col("event_type"), expr(s"unix_micros(ts) div $MicrosPerDay").as("t"))
      .groupBy(col("event_type"), col("t"))
      .agg(count(lit(1)).as("y"))
    val a = daily.select(col("event_type"), col("t").as("t1"), col("y").as("y1"))
    val b = daily.select(col("event_type"), col("t").as("t2"), col("y").as("y2"))
    a.join(b, Seq("event_type"))
      .where(col("t1") < col("t2"))
      .select(
        col("event_type"),
        ((col("y2") - col("y1")).cast("double") /
          (col("t2") - col("t1")).cast("double")).as("slope"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_pairs"),
        round(expr("percentile(slope, 0.5D)"), 6).as("slope_r"))
      .orderBy("event_type")
  }

  /** DuckDB twin of [[theilSen]] — same rollup, same pair algebra, same
    * interpolated median.
    */
  def oracleTheilSen: String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_us(ts) // $MicrosPerDay AS t, count(*) AS y
       |  FROM events WHERE ts IS NOT NULL GROUP BY event_type, t),
       |p AS (
       |  SELECT a.event_type,
       |    CAST(b.y - a.y AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS slope
       |  FROM daily a JOIN daily b ON a.event_type = b.event_type AND a.t < b.t)
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
       |  round(quantile_cont(slope, 0.5), 6) AS slope_r
       |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin

  // --- calendar-spine gap fill ----------------------------------------------

  private val MicrosPerHour = 3600000000L

  /** Gap-filled hourly series per event type — the dense calendar spine a
    * charting layer, forecaster, or SLA monitor needs: a (type, hour) with
    * zero events must appear as an explicit zero row (and be flagged), not
    * silently vanish from the aggregate. "No data" IS the signal an ingest
    * monitor exists to catch.
    *
    * Scale shape: the raw scan collapses to the (type, hour) aggregate
    * first (map-side combinable); the spine is generated from that
    * aggregate's 1-row bounds (`sequence(min,max)` exploded — spine size ∝
    * observed hours, never the event count) crossed with the distinct type
    * list — both post-aggregate relations, so the cross and the zero-fill
    * left join are broadcast-sized by construction. Raw events never meet
    * the spine.
    */
  def gapFilledHourly(events: DataFrame): DataFrame = {
    val hourly = timed(events)
      .select(col("event_type"), expr(s"unix_micros(ts) div $MicrosPerHour").as("hour"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n"))
    val hours = hourly.agg(min(col("hour")).as("mn"), max(col("hour")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("hour"))
    val types = hourly.select(col("event_type")).distinct()
    types
      .crossJoin(broadcast(hours))
      .join(hourly, Seq("event_type", "hour"), "left")
      .select(
        col("event_type"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        col("n").isNull.as("is_gap")
      )
      .orderBy("event_type", "hour")
  }

  /** DuckDB twin of [[gapFilledHourly]]. */
  def oracleGapFilledHourly: String =
    s"""WITH hourly AS (
       |  SELECT event_type, epoch_us(ts) // $MicrosPerHour AS hour, count(*) AS n
       |  FROM events WHERE ts IS NOT NULL GROUP BY event_type, hour),
       |b AS (SELECT min(hour) AS mn, max(hour) AS mx FROM hourly),
       |hours AS (SELECT unnest(generate_series(mn, mx)) AS hour FROM b),
       |types AS (SELECT DISTINCT event_type FROM hourly)
       |SELECT t.event_type, h.hour,
       |  CAST(coalesce(n.n, 0) AS BIGINT) AS n_events,
       |  n.n IS NULL AS is_gap
       |FROM types t CROSS JOIN hours h
       |LEFT JOIN hourly n ON t.event_type = n.event_type AND h.hour = n.hour
       |ORDER BY t.event_type, h.hour""".stripMargin

  // --- sequential pattern mining --------------------------------------------

  /** Top-`k` event-type TRIGRAMS within sessions — the sequential-pattern
    * report ("view → view → purchase") a behavioral pipeline mines for
    * funnel hypotheses. Session boundaries are [[graft.streaming.Sessionize]]'s
    * gap-and-island definition (same `gapSeconds`, same (t, event_id)
    * ordering), so a trigram never spans two sessions.
    *
    * Scale shape: one hash-shuffle on user_id feeds BOTH window stages —
    * hashpartitioning(user_id) already satisfies the second window's
    * (user_id, session_idx) clustering, so Catalyst inserts a sort, not a
    * second exchange. The trigram count is a map-side-combinable groupBy on
    * a |types|³-bounded key space, and the cut is TakeOrderedAndProject
    * under a total order (count desc, then the three types).
    */
  def sessionTrigrams(
      events: DataFrame,
      gapSeconds: Long = graft.streaming.Sessionize.DefaultGapSeconds,
      k: Int = 50
  ): DataFrame = {
    val gapUs = gapSeconds * 1000000L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("session_idx")).orderBy(col("t"), col("event_id"))
    timed(events)
      .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      .withColumn(
        "nf",
        when(lag(col("t"), 1).over(w).isNull || col("t") - lag(col("t"), 1).over(w) > gapUs, 1L)
          .otherwise(0L)
      )
      .withColumn(
        "session_idx",
        sum(col("nf")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
      )
      .select(
        col("event_type").as("t1"),
        lead(col("event_type"), 1).over(ws).as("t2"),
        lead(col("event_type"), 2).over(ws).as("t3")
      )
      .where(col("t3").isNotNull)
      .groupBy("t1", "t2", "t3")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(k)
  }

  /** DuckDB twin of [[sessionTrigrams]] — same sessionization CTE as
    * [[graft.streaming.Sessionize.oracleBatchSessions]], then `lead` ×2.
    */
  def oracleSessionTrigrams(
      gapSeconds: Long = graft.streaming.Sessionize.DefaultGapSeconds,
      k: Int = 50
  ): String = {
    val gapUs = gapSeconds * 1000000L
    s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events
       |  WHERE ts IS NOT NULL),
       |flg AS (
       |  SELECT user_id, event_id, event_type, t,
       |    (CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > $gapUs THEN 1 ELSE 0 END) AS nf
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
       |sess AS (
       |  SELECT user_id, event_id, event_type, t,
       |    sum(nf) OVER (PARTITION BY user_id ORDER BY t, event_id ROWS UNBOUNDED PRECEDING)
       |      AS session_idx
       |  FROM flg),
       |seq AS (
       |  SELECT event_type AS t1,
       |    lead(event_type, 1) OVER ws AS t2,
       |    lead(event_type, 2) OVER ws AS t3
       |  FROM sess WINDOW ws AS (PARTITION BY user_id, session_idx ORDER BY t, event_id))
       |SELECT t1, t2, t3, count(*) AS n
       |FROM seq WHERE t3 IS NOT NULL
       |GROUP BY t1, t2, t3
       |ORDER BY n DESC, t1, t2, t3 LIMIT $k""".stripMargin
  }

  // --- exponentially weighted smoothing -------------------------------------

  /** Per-type EWMA of daily event volume with α = 1/2, truncated at
    * `horizon` days — the smoothed load curve a capacity dashboard plots.
    * With a power-of-two α every weight is a power of two, so the whole
    * smoother is EXACT INTEGER algebra (the repo's cross-engine rule: no
    * order-dependent float accumulation): the numerator is
    *
    *   num(d) = Σ_{j=0..horizon−1} count(d−j) · 2^(horizon−1−j)
    *
    * (missing calendar days contribute 0), and the implied denominator is
    * the constant 2^horizon − err where err only matters at the series head;
    * the declared output is the exact numerator — a client divides by
    * 2^horizon for the display value. counts ≤ ~10¹⁰/day stay inside long
    * at horizon 20 (10¹⁰·2¹⁹·20 ≈ 10¹⁷).
    *
    * Scale shape: the daily rollup (map-side combinable) collapses the fact
    * table to |types|·|days| rows FIRST; the weighted sum is then a
    * range-join of that tiny rollup with itself on (type, 0 ≤ Δday <
    * horizon) — the join input is the rollup, never the raw events, so at
    * 100 TB the smoother costs one aggregate plus an O(|types|·|days|·
    * horizon) joinlet.
    */
  def ewmaDailyVolume(events: DataFrame, horizon: Int = 20): DataFrame = {
    require(horizon >= 1 && horizon <= 40, "horizon must keep 2^horizon in long range")
    // NULL-typed events have no per-type series: excluded HERE, explicitly —
    // the self-join's null-rejecting equality would drop them anyway (as does
    // the oracle twin's JOIN), but only after carrying them through the rollup
    val daily = timed(events)
      .where(col("event_type").isNotNull)
      .select(col("event_type"), expr(s"unix_micros(ts) div $MicrosPerDay").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"))
    val hist = daily.select(
      col("event_type").as("et2"), col("day").as("day2"), col("n_events").as("n2"))
    daily
      .join(
        hist,
        col("event_type") === col("et2") &&
          (col("day") - col("day2")).between(0, horizon - 1)
      )
      .groupBy(col("event_type"), col("day"), col("n_events"))
      .agg(
        sum(col("n2") * expr(s"shiftleft(1L, ${horizon - 1} - cast(day - day2 AS int))"))
          .as("ewma_num")
      )
      .orderBy("event_type", "day")
      .select("event_type", "day", "n_events", "ewma_num")
  }

  /** DuckDB twin of [[ewmaDailyVolume]] — same rollup, same power-of-two
    * weights (`2^k` is float-exact well past k = 40, so the POWER cast is
    * portable).
    */
  def oracleEwmaDailyVolume(horizon: Int = 20): String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_us(ts) // $MicrosPerDay AS day, count(*) AS n_events
       |  FROM events WHERE ts IS NOT NULL GROUP BY event_type, day)
       |SELECT d.event_type, d.day, d.n_events,
       |  CAST(sum(h.n_events * CAST(POWER(2, ${horizon - 1} - (d.day - h.day)) AS BIGINT))
       |    AS BIGINT) AS ewma_num
       |FROM daily d JOIN daily h
       |  ON d.event_type = h.event_type AND d.day - h.day BETWEEN 0 AND ${horizon - 1}
       |GROUP BY d.event_type, d.day, d.n_events
       |ORDER BY d.event_type, d.day""".stripMargin

  // --- monthly cohort retention ----------------------------------------------

  /** Monthly cohort retention matrix — for each signup cohort (the calendar
    * month of a user's first event, UTC), how many of its users were active
    * 0, 1, 2… months later, with the exact per-mille retention share. The
    * growth report every product/ops team runs; here it doubles as the
    * corpus-freshness view of a training-data feed ("how much of January's
    * source population is still emitting in June").
    *
    * Scale shape: the raw scan collapses to the DISTINCT (user, month)
    * activity relation first — the one corpus-sized shuffle. The cohort
    * assignment is a per-user window min over that same relation (each
    * partition is one user's active months, calendar-bounded), the matrix
    * is a |cohorts|·|months| rollup, and the cohort size rides a
    * per-cohort window over the rollup. ONE tree — the former join form
    * planned the scan→distinct subtree three times (r19). No window ever
    * sees raw events, and no state holds a user set — the same first-seen
    * doctrine as [[cumulativeUsers]].
    *
    * Determinism: month index = UTC year·12 + month − 1 (integer calendar
    * arithmetic, both engines); retention is EXACT integer per-mille
    * (1000·n_active div n_cohort), never a float ratio.
    */
  def cohorts(events: DataFrame): DataFrame = {
    // Single-tree form (r19, guide §2.4): the former three-relation build
    // (activity ⋈ per-user-min cohort, plus a cohort-size aggregate) planned
    // the scan→distinct subtree THREE times — the legs optimize into
    // non-canonically-equal exchanges (the size leg's distinct folds into
    // its min-aggregate), so AQE stage reuse cannot dedup them
    // (plans/r19/cohorts_events_before.txt: 3 scans). Now: cohort rides a
    // per-user window min over the one distinct relation (partitions are one
    // user's active MONTHS — calendar-bounded), and n_cohort rides a
    // per-cohort window over the ALREADY-AGGREGATED matrix — n_cohort(c) ≡
    // n_active(c, 0), because each user's min month is attained, so the
    // months_since=0 cell counts exactly the users whose cohort is c (the
    // former count of the per-user min relation). NULL user_id rows are
    // dropped explicitly — the former inner join dropped them implicitly.
    import org.apache.spark.sql.expressions.Window
    val activity = timed(events)
      .select(col("user_id"),
        (year(col("ts")) * 12 + month(col("ts")) - 1).cast("long").as("midx"))
      .distinct()
    // NULL-user exactness (mirrors the former relational form bit for bit):
    // groupBy and window partitioning agree that all NULL user_ids are ONE
    // group, so the window min is the old cohort relation's min. The old
    // `sizes` counted that NULL group in its cohort's n_cohort, while the
    // old inner join dropped NULL rows from the matrix — so each cell counts
    // rows twice: n_active over non-NULL users only (`count(user_id)`), and
    // n_rows over all. n_cohort(c) = n_rows at months_since 0 (every user's
    // min is attained, contributing exactly one month-0 row), and NULL-only
    // cells (n_active = 0) are filtered — they never existed in the join.
    val matrix = activity
      .withColumn("cohort", min(col("midx")).over(Window.partitionBy(col("user_id"))))
      .groupBy(col("cohort"), (col("midx") - col("cohort")).as("months_since"))
      .agg(count(col("user_id")).as("n_active"), count(lit(1)).as("n_rows"))
    matrix
      .withColumn("n_cohort",
        max(when(col("months_since") === 0, col("n_rows")))
          .over(Window.partitionBy(col("cohort"))))
      .where(col("n_active") > 0)
      .select(col("cohort"), col("months_since"), col("n_active"), col("n_cohort"),
        expr("1000 * n_active div n_cohort").as("retention_millis"))
      .orderBy("cohort", "months_since")
  }

  /** DuckDB twin of [[cohorts]] — same UTC month index, same exact integer
    * per-mille (`//` and `div` agree: both floor, operands positive).
    */
  def oracleCohorts: String =
    s"""WITH a AS (
       |  SELECT DISTINCT user_id, year(ts) * 12 + month(ts) - 1 AS midx FROM events
       |  WHERE ts IS NOT NULL),
       |c AS (SELECT user_id, min(midx) AS cohort FROM a GROUP BY user_id),
       |s AS (SELECT cohort, count(*) AS n_cohort FROM c GROUP BY cohort),
       |j AS (
       |  SELECT c.cohort, a.midx - c.cohort AS months_since, count(*) AS n_active
       |  FROM a JOIN c ON a.user_id = c.user_id GROUP BY 1, 2)
       |SELECT CAST(j.cohort AS BIGINT) AS cohort,
       |  CAST(j.months_since AS BIGINT) AS months_since,
       |  CAST(j.n_active AS BIGINT) AS n_active,
       |  CAST(s.n_cohort AS BIGINT) AS n_cohort,
       |  CAST(1000 * j.n_active AS BIGINT) // s.n_cohort AS retention_millis
       |FROM j JOIN s ON j.cohort = s.cohort
       |ORDER BY cohort, months_since""".stripMargin
}
