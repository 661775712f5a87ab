package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling — the data-mix levers of a
  * training pipeline (downsample a source, rebalance languages/classes,
  * carve reproducible eval slices).
  *
  * Engine-native `sample()` is NOT portable (each engine's RNG and split
  * semantics differ) and not stable under repartitioning. Hash gating is
  * both: a row is kept iff the first 8 md5 hex digits of
  * `"<key>:<salt>"` — a uniform 32-bit integer, identical in Spark and
  * DuckDB — fall below `fraction · 2³²`. Properties a pipeline needs:
  *
  *  - '''Reproducible''': same key+salt+fraction → same decision, on any
  *    engine, any partitioning, any day.
  *  - '''Stable under fraction growth''': the 10% sample is a SUBSET of the
  *    20% sample (same hash, higher threshold) — growing a training mix
  *    never churns previously selected rows.
  *  - '''Disjoint by salt''': train/eval splits use different salts, giving
  *    independent gates on the same keys.
  *
  * Per-row projection + filter: no shuffle, trivially parallel at 100 TB,
  * and the filter sits directly on the scan.
  */
object Sampling {

  /** 2³² as a long — the hash-space size of the 8-hex-digit gate. */
  val HashSpace: Long = 4294967296L

  private[graft] def gate(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":" + salt)).cast("binary")), 1, 8), 16, 10)
      .cast("long")

  private[graft] def threshold(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction must be in [0,1] (got $fraction)")
    math.floor(fraction * HashSpace).toLong
  }

  /** Keep ≈`fraction` of rows, decided per row by the key's hash gate. */
  def sampleByHash(df: DataFrame, keyCol: String, fraction: Double, salt: String = "graft"): DataFrame =
    df.where(gate(col(keyCol), salt) < threshold(fraction))

  /** Per-stratum fractions (e.g. language rebalancing: keep 100% of the
    * low-resource languages, 10% of the dominant one). Strata absent from
    * the map fall back to `defaultFraction`.
    */
  def stratifiedSampleByHash(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      salt: String = "graft"
  ): DataFrame = {
    val thr = fractions.foldLeft(lit(threshold(defaultFraction))) { case (acc, (stratum, fr)) =>
      when(col(strataCol) === stratum, lit(threshold(fr))).otherwise(acc)
    }
    df.where(gate(col(keyCol), salt) < thr)
  }

  /** Per-stratum quota capping: keep at most `cap` rows per stratum, chosen
    * by hash order (a reproducible shuffle of each stratum, same gate as
    * [[sampleByHash]]). This is the domain-balancing primitive of web-corpus
    * pipelines — no single source may contribute more than its quota to the
    * training mix, and the kept subset must be stable across reruns and
    * engines (so growing the corpus never churns already-selected rows of an
    * unchanged stratum).
    *
    * Scale shape: a rank-limit window, NOT a global sort. Spark's
    * WindowGroupLimit pushes the `rank <= cap` filter into a per-partition
    * partial top-k BEFORE the stratum shuffle (plan-shape-asserted), so the
    * exchange carries ≤ cap·|partitions| rows per stratum, never the stratum
    * itself — the hot-domain skew case is bounded by construction.
    */
  def quotaByHash(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      cap: Int,
      salt: String = "graft"
  ): DataFrame = {
    require(cap > 0, s"cap must be positive (got $cap)")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(gate(col(keyCol), salt), col(keyCol))
    graft.Tables.widen(df)
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= cap)
      .drop("__rk")
  }

  /** The holdout slice a training run actually materializes: the train
    * sample MINUS the bench slice, as a relational EXCEPT (row-level set
    * difference; rows are unique per key so EXCEPT ≡ EXCEPT ALL here). A
    * hash-gated twin of the anti-join shape — Spark plans it as a left-anti
    * hash aggregate over both gated scans.
    */
  def holdout(
      df: DataFrame,
      keyCol: String,
      trainFraction: Double,
      benchFraction: Double,
      trainSalt: String = "graft",
      benchSalt: String = "bench"
  ): DataFrame =
    sampleByHash(df, keyCol, trainFraction, trainSalt)
      .except(sampleByHash(df, keyCol, benchFraction, benchSalt))
      .orderBy(keyCol)

  /** The salt-overlap slice (train ∩ eval) as a relational INTERSECT — the
    * leakage set two independently-salted gates share; the property specs
    * bound its size, this declared form hash-checks its exact membership.
    */
  def saltOverlap(
      df: DataFrame,
      keyCol: String,
      fraction: Double,
      saltA: String = "train",
      saltB: String = "eval"
  ): DataFrame =
    sampleByHash(df, keyCol, fraction, saltA)
      .intersect(sampleByHash(df, keyCol, fraction, saltB))
      .orderBy(keyCol)

  /** Train/val/test split assignment as BANDS of ONE hash gate: a row lands
    * in `train` iff gate < ⌊trainFrac·2³²⌋, in `val` iff gate < ⌊(trainFrac+
    * valFrac)·2³²⌋, else in `test`. One gate (not three salted ones) makes
    * the three-way split a partition by construction — every row gets
    * exactly one label, no overlap/gap audit needed — and keeps the
    * subset-under-growth property DIRECTIONAL: raising trainFrac only moves
    * rows from val/test into train, never reshuffles existing members (the
    * property a long-lived corpus needs so checkpointed training runs stay
    * valid as the split ratio evolves). Per-row projection, no shuffle.
    */
  def splitAssign(
      df: DataFrame,
      keyCol: String,
      trainFrac: Double,
      valFrac: Double,
      salt: String = "split"
  ): DataFrame = {
    require(trainFrac + valFrac <= 1.0, s"train+val must be ≤ 1 (got ${trainFrac + valFrac})")
    val g = gate(col(keyCol), salt)
    df.withColumn(
      "split",
      when(g < threshold(trainFrac), "train")
        .when(g < threshold(trainFrac + valFrac), "val")
        .otherwise("test")
    )
  }

  /** The declared split report: per (split, lang) doc and token counts — the
    * sanity table a pipeline checks before training (is val big enough, is
    * any language missing from test?). Map-side-combinable groupBy on a
    * |splits|×|langs| key over the [[splitAssign]] projection; the gate
    * filter never shuffles, the aggregate exchanges only the tiny rollup.
    */
  def splitReport(docs: DataFrame, trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    val toks = size(regexp_extract_all(col("text"), lit(graft.text.TextOps.TokenRe), lit(0))).cast("long")
    splitAssign(graft.Tables.widen(docs), "doc_id", trainFrac, valFrac)
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(toks).as("n_tokens"))
      .orderBy("split", "lang")
  }

  // --- oracles --------------------------------------------------------------

  private[graft] def oracleGate(keyCol: String, salt: String): String =
    s"CAST('0x' || substr(md5($keyCol || ':$salt'), 1, 8) AS BIGINT)"

  /** DuckDB twin of [[splitReport]]: the same gate banded by the same
    * thresholds, rolled up the same way.
    */
  def oracleSplitReport(trainFrac: Double = 0.8, valFrac: Double = 0.1, salt: String = "split"): String =
    s"""SELECT split, lang, count(*) AS n_docs,
       |  CAST(sum(CAST(len(regexp_extract_all(text, '${graft.text.TextOps.TokenRe}')) AS BIGINT)) AS BIGINT) AS n_tokens
       |FROM (
       |  SELECT lang, text,
       |    CASE WHEN ${oracleGate("doc_id", salt)} < ${threshold(trainFrac)} THEN 'train'
       |         WHEN ${oracleGate("doc_id", salt)} < ${threshold(trainFrac + valFrac)} THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents)
       |GROUP BY split, lang ORDER BY split, lang""".stripMargin

  /** DuckDB twin of [[sampleByHash]] over `table`, emitting `cols` ordered
    * by the key.
    */
  def oracleSampleByHash(
      table: String,
      keyCol: String,
      cols: Seq[String],
      fraction: Double,
      salt: String = "graft"
  ): String =
    s"""SELECT ${cols.mkString(", ")} FROM $table
       |WHERE ${oracleGate(keyCol, salt)} < ${threshold(fraction)}
       |ORDER BY $keyCol""".stripMargin

  /** DuckDB twin of [[holdout]] — the same EXCEPT over the same gates. */
  def oracleHoldout(
      table: String,
      keyCol: String,
      cols: Seq[String],
      trainFraction: Double,
      benchFraction: Double,
      trainSalt: String = "graft",
      benchSalt: String = "bench"
  ): String =
    s"""SELECT ${cols.mkString(", ")} FROM $table
       |WHERE ${oracleGate(keyCol, trainSalt)} < ${threshold(trainFraction)}
       |EXCEPT
       |SELECT ${cols.mkString(", ")} FROM $table
       |WHERE ${oracleGate(keyCol, benchSalt)} < ${threshold(benchFraction)}
       |ORDER BY $keyCol""".stripMargin

  /** DuckDB twin of [[saltOverlap]]. */
  def oracleSaltOverlap(
      table: String,
      keyCol: String,
      cols: Seq[String],
      fraction: Double,
      saltA: String = "train",
      saltB: String = "eval"
  ): String =
    s"""SELECT ${cols.mkString(", ")} FROM $table
       |WHERE ${oracleGate(keyCol, saltA)} < ${threshold(fraction)}
       |INTERSECT
       |SELECT ${cols.mkString(", ")} FROM $table
       |WHERE ${oracleGate(keyCol, saltB)} < ${threshold(fraction)}
       |ORDER BY $keyCol""".stripMargin

  /** DuckDB twin of [[quotaByHash]]: the identical row_number window over
    * (hash gate, key) per stratum.
    */
  def oracleQuotaByHash(
      table: String,
      keyCol: String,
      strataCol: String,
      cols: Seq[String],
      cap: Int,
      salt: String = "graft"
  ): String =
    s"""SELECT ${cols.mkString(", ")} FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY $strataCol ORDER BY ${oracleGate(keyCol, salt)}, $keyCol) AS rk
       |  FROM $table)
       |WHERE rk <= $cap ORDER BY $keyCol""".stripMargin

  /** DuckDB twin of [[stratifiedSampleByHash]]. */
  def oracleStratifiedSampleByHash(
      table: String,
      keyCol: String,
      strataCol: String,
      cols: Seq[String],
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      salt: String = "graft"
  ): String = {
    // mirror the foldLeft's LAST-ENTRY-WINS when-cascade order
    val cases = fractions.toSeq.reverse
      .map { case (stratum, fr) => s"WHEN $strataCol = '$stratum' THEN ${threshold(fr)}" }
      .mkString(" ")
    s"""SELECT ${cols.mkString(", ")} FROM $table
       |WHERE ${oracleGate(keyCol, salt)} < (CASE $cases ELSE ${threshold(defaultFraction)} END)
       |ORDER BY $keyCol""".stripMargin
  }

  // --- mixture sampling-rate planner -----------------------------------------

  /** Target language shares for the declared mixture plan, as EXACT integer
    * fractions (num/den) — float shares like 0.2 are not exact in binary and
    * DuckDB parses the literal `0.2` as DECIMAL, a classic cross-engine
    * divergence; integer fractions keep every planned token count an exact
    * long in both engines. Languages absent from the map get share 0.
    */
  val MixShares: Seq[(String, Long, Long)] =
    Seq(("en", 1L, 2L), ("zh", 1L, 5L), ("es", 1L, 5L), ("fr", 1L, 10L))

  /** Token-budget mixture planner — the step between measuring a corpus mix
    * ([[graft.text.TextOps.mixtureReport]]) and sampling it
    * ([[stratifiedSampleByHash]]): given target language shares and a token
    * budget (half the corpus here), compute per-language target tokens,
    * achievable planned tokens (capped at what the language has), and the
    * sampling rate to feed the stratified sampler.
    *
    * All token arithmetic is exact-integer (`div`), the only double is the
    * final `rate = planned/have` quotient (the declared-ratio convention).
    * Plan: one scan → per-lang sum (map-side combinable) → 1-row total
    * broadcast back over the handful of language rows — at 100 TB the
    * exchange carries |langs| rows, nothing else.
    */
  def mixPlan(docs: DataFrame): DataFrame = {
    val spark  = docs.sparkSession
    import spark.implicits._
    val shares = broadcast(MixShares.toDF("lang", "share_num", "share_den"))
    val tokens = graft.Tables.widen(docs)
      .select(col("lang"), size(regexp_extract_all(col("text"), lit("[^ ]+"), lit(0))).cast("long").as("n"))
    val perLang = tokens.groupBy(col("lang")).agg(sum(col("n")).as("lang_tokens"))
    val total   = perLang.agg(sum(col("lang_tokens")).as("total_tokens"))
    perLang
      .crossJoin(broadcast(total))
      .join(shares, Seq("lang"), "left")
      .withColumn("budget", expr("total_tokens div 2"))
      .withColumn(
        "target_tokens",
        coalesce(expr("(budget * share_num) div share_den"), lit(0L))
      )
      .withColumn("planned_tokens", least(col("target_tokens"), col("lang_tokens")))
      .withColumn("rate", col("planned_tokens").cast("double") / col("lang_tokens"))
      .select(col("lang"), col("lang_tokens"), col("target_tokens"), col("planned_tokens"), col("rate"))
      .orderBy("lang")
  }

  /** DuckDB twin of [[mixPlan]] — same integer-fraction shares inlined as a
    * VALUES CTE, same `//` integer division, same single double quotient.
    */
  def oracleMixPlan: String = {
    val values = MixShares.map { case (l, n, d) => s"('$l', $n, $d)" }.mkString(", ")
    s"""WITH tok AS (
       |  SELECT lang, CAST(len(regexp_extract_all(text, '[^ ]+')) AS BIGINT) AS n FROM documents),
       |g AS (SELECT lang, CAST(sum(n) AS BIGINT) AS lang_tokens FROM tok GROUP BY lang),
       |t AS (SELECT CAST(sum(lang_tokens) AS BIGINT) AS total_tokens FROM g),
       |s(lang, share_num, share_den) AS (VALUES $values),
       |planned AS (
       |  SELECT g.lang, g.lang_tokens,
       |    CAST(coalesce(((t.total_tokens // 2) * s.share_num) // s.share_den, 0) AS BIGINT) AS target_tokens
       |  FROM g CROSS JOIN t LEFT JOIN s ON g.lang = s.lang)
       |SELECT lang, lang_tokens, target_tokens,
       |  least(target_tokens, lang_tokens) AS planned_tokens,
       |  CAST(least(target_tokens, lang_tokens) AS DOUBLE) / lang_tokens AS rate
       |FROM planned ORDER BY lang""".stripMargin
  }
}
