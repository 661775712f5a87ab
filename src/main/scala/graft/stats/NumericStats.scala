package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric column profiling — the measure-column envelope (count / min /
  * max / exact sum) and fixed-width histograms that classical profilers
  * emit alongside the type/PII classification (reference S1 scope extended
  * to numeric semantics; SURVEY §2.6 "aggregation" row).
  *
  * One scan computes every column's envelope (multi-aggregate, map-side
  * partial, 1-row exchange — same shape as StatsPass job set A); the
  * `stack` pivot to one-row-per-column happens after aggregation, so it
  * costs nothing. Histograms are a groupBy on an integer bucket key —
  * map-side combinable, exchange carries |buckets| rows.
  *
  * Cross-engine canonicalization (the declared contract):
  *  - counts are exact longs;
  *  - min/max are INPUT values cast to double (bit-exact in both engines —
  *    no arithmetic is performed on them; integral inputs here are far
  *    under 2⁵³);
  *  - sums go through DECIMAL(28,6) and are DECLARED as the decimal's
  *    fixed-scale string rendering. Float summation is order-dependent
  *    (forbidden by the repo convention) and decimal→double conversion can
  *    differ by 1 ulp between engines at large magnitudes, which the
  *    bit-exact float compare would catch — the string rendering of the
  *    exact decimal is deterministic on both engines (the DataVault
  *    hashdiff pattern, `DataVault.scala:121`). The testdata's doubles are
  *    ≤6-decimal, so the decimal cast is exact;
  *  - histogram buckets are `floor(x / width)` — identical IEEE division
  *    and floor on identical inputs, compared as exact longs.
  */
object NumericStats {

  /** Backtick-quote an identifier for interpolation into selectExpr/stack
    * strings — the same escaping StatsPass.rawCol applies through the Column
    * API; a name containing a backtick must not break the parsed expression.
    */
  private def bq(name: String): String = s"`${name.replace("`", "``")}`"

  /** Single-quote a string literal for the same interpolation sites. */
  private def sq(s: String): String = s"'${s.replace("'", "''")}'"

  /** Per-column numeric envelope over a single scan:
    * (column_name, n_nonnull, min_v, max_v, sum_str), ordered by column.
    */
  def numericStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numericStats needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        sum(col(c).cast("decimal(28,6)")).cast("decimal(28,6)").cast("string").as(s"${c}__sum")
      )
    }
    val agged = graft.Tables.widen(df).agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"${sq(c)}, ${bq(c + "__n")}, ${bq(c + "__min")}, ${bq(c + "__max")}, ${bq(c + "__sum")}")
      .mkString(", ")
    agged
      .selectExpr(s"stack(${cols.size}, $stackArgs) AS (column_name, n_nonnull, min_v, max_v, sum_str)")
      .orderBy("column_name")
  }

  def oracleNumericStats(table: String, cols: Seq[String]): String =
    cols
      .map { c =>
        s"""SELECT '$c' AS column_name, count($c) AS n_nonnull,
           |  CAST(min($c) AS DOUBLE) AS min_v, CAST(max($c) AS DOUBLE) AS max_v,
           |  CAST(CAST(sum(CAST($c AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS VARCHAR) AS sum_str
           |FROM $table""".stripMargin
      }
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")

  /** Fixed-width histogram of a numeric column: bucket i covers
    * [i·width, (i+1)·width). Fixed (not data-derived) bounds keep the query
    * one scan and the bucketing portable; nulls are excluded on both sides.
    */
  def histogram(df: DataFrame, c: String, width: Double): DataFrame = {
    require(width > 0, s"width must be positive (got $width)")
    // no widen() (r19): one floor-division per row collapses map-side into
    // |buckets| partial rows before the exchange — the round-robin
    // pre-shuffle moved every row to parallelize near-zero work
    df
      .where(col(c).isNotNull)
      .groupBy(floor(col(c).cast("double") / width).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  def oracleHistogram(table: String, c: String, width: Double): String =
    s"""SELECT CAST(floor(CAST($c AS DOUBLE) / $width) AS BIGINT) AS bucket, count(*) AS n
       |FROM $table WHERE $c IS NOT NULL
       |GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Radix-refinement bits per round and the resolve-by-collect bound of the
    * rank-select kernel (see [[quantiles]]): each round buckets the
    * order-preserving 64-bit key ([[DoubleOrderKey]]) by its next
    * [[RefineBits]] bits, so ≤ ⌈64/[[RefineBits]]⌉ = 4 rounds isolate an
    * exact key for ANY value distribution; a target bucket at or under
    * [[CollectCap]] rows resolves by collecting just that bucket's keys
    * (64 KiB of longs per target bucket at the cap — with ≤ 2·|qs| target
    * ranks per (group, column), driver transfer stays MBs-bounded while
    * most real distributions resolve in hist + collect = two jobs).
    */
  private[graft] val RefineBits = 16
  private[graft] val CollectCap = 65536

  /** The narrow keyed relation the rank-select kernel aggregates over:
    * (g, col_idx, k) — g the (string) group, "" for ungrouped callers;
    * k the order-preserving long key of the double value — one stacked
    * scan, null values dropped, NO shuffle of data rows anywhere. Exposed
    * for the plan-shape regression test.
    */
  private[graft] def stackedKeys(
      df: DataFrame, cols: Seq[String], groupCol: Option[String]): DataFrame = {
    val stackArgs = cols.zipWithIndex
      .map { case (c, i) => s"$i, CAST(${bq(c)} AS DOUBLE)" }
      .mkString(", ")
    val g = groupCol
      .map(gc => s"CAST(${bq(gc)} AS STRING)")
      .getOrElse("''")
    df.selectExpr(s"$g AS g", s"stack(${cols.size}, $stackArgs) AS (col_idx, v)")
      .where(s"v IS NOT NULL${if (groupCol.isDefined) " AND g IS NOT NULL" else ""}")
      .select(col("g"), col("col_idx"), DoubleOrderKey(col("v")).as("k"))
  }

  /** The histogram pass of the kernel: per-(g, col_idx, key >> shift)
    * counts — a map-side-combinable aggregate whose exchange carries only
    * occupied BUCKET rows (≤ 2^[[RefineBits]] per group × column), never
    * data rows. Exposed for the plan-shape regression test.
    */
  private[graft] def bucketHist(stacked: DataFrame, shift: Int): DataFrame =
    stacked
      .groupBy(col("g"), col("col_idx"), shiftright(col("k"), shift).as("b"))
      .agg(count(lit(1)).as("n"))

  /** Exact distributed selection of the values at a set of global ranks per
    * (group, column), by radix-histogram refinement over the
    * order-preserving key ([[DoubleOrderKey]]) — ZERO data shuffle (r19;
    * the former kernel range-sorted the whole stacked relation, i.e. one
    * full shuffle + a two-pass persisted scan, and before that Spark's
    * `percentile` buffered whole columns in one aggregate):
    *
    *  1. one map-combined histogram of the top [[RefineBits]] key bits per
    *     (group, column) — the exchange carries occupied-bucket COUNT rows
    *     only; totals, target ranks floor/ceil((n−1)·q), and each rank's
    *     bucket + rank-within-bucket fall out at the driver;
    *  2. targets in buckets over [[CollectCap]] rows refine: one filtered
    *     histogram per round over the next [[RefineBits]] bits — ≤ 6
    *     rounds total by construction (64-bit keys), and a shift-0 bucket
    *     IS an exact key (decoded driver-side, any multiplicity);
    *  3. targets in ≤ [[CollectCap]]-row buckets resolve by one combined
    *     filtered collect of just those buckets' keys, ranked driver-side.
    *
    * Driver state is bounded by occupied buckets per round plus
    * ≤ CollectCap keys per target bucket. Returns:
    * (totals per (g, ci), (g, ci, rank) → value) — callers derive their
    * target ranks from the totals via `ranksFor`, so the first histogram
    * doubles as the count pass (no separate counting job).
    */
  private def selectRanks(
      stacked: DataFrame,
      ranksFor: Map[(String, Int), Long] => Map[(String, Int), Set[Long]]
  ): (Map[(String, Int), Long], Map[(String, Int, Long), Double]) = {
    // The kernel re-reads `stacked` once per round (≤ 6 rounds, typically
    // 2–3 jobs). It does NOT cache the frame itself: for the dominant
    // callers the upstream is a raw columnar scan + stack projection, and
    // re-scanning that is measurably cheaper than materializing a cache
    // (A/B'd at sf0.1, r19). A caller whose input subtree is expensive
    // (e.g. a window pipeline) should hand the kernel a checkpointed frame
    // — [[graft.analytics.EventOps.interArrival]] does.
    val topShift = 64 - RefineBits
    def collectHist(df: DataFrame): Map[(String, Int, Long), Long] =
      df.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    val h0 = collectHist(bucketHist(stacked, topShift))
    val totals: Map[(String, Int), Long] =
      h0.groupMapReduce { case ((g, ci, _), _) => (g, ci) }(_._2)(_ + _)

    // target state: (g, ci, globalRank) -> (bucket, rankInBucket, bucketCount)
    final case class T(bucket: Long, rib: Long, cnt: Long)
    def locate(hist: Map[(String, Int, Long), Long], g: String, ci: Int, rib0: Long,
        within: Option[Long => Boolean]): T = {
      val buckets = hist.keysIterator
        .filter { case (hg, hc, b) => hg == g && hc == ci && within.forall(f => f(b)) }
        .map(_._3).toArray.sorted
      var acc = 0L
      var res: T = null
      var bi = 0
      while (res == null && bi < buckets.length) {
        val b   = buckets(bi)
        val cnt = hist((g, ci, b))
        if (rib0 < acc + cnt) res = T(b, rib0 - acc, cnt)
        acc += cnt
        bi += 1
      }
      require(res != null, s"rank $rib0 not found in histogram of ($g, $ci)")
      res
    }
    var shift = topShift
    var active: Map[(String, Int, Long), T] =
      ranksFor(totals).toSeq.flatMap { case ((g, ci), rs) =>
        rs.map(r => (g, ci, r) -> locate(h0, g, ci, r, None))
      }.toMap
    val resolved = scala.collection.mutable.Map.empty[(String, Int, Long), Double]
    def bucketCond(wanted: Iterable[(String, Int, Long)], atShift: Int) =
      wanted.toSeq.distinct.map { case (g, ci, b) =>
        col("g") === g && col("col_idx") === ci && shiftright(col("k"), atShift) === b
      }.reduce(_ || _)

    while (active.nonEmpty) {
      // shift-0 buckets are exact keys: decode, done (any multiplicity)
      val (exact, rest) = active.partition { case _ => shift == 0 }
      exact.foreach { case (key, t) => resolved(key) = DoubleOrderKey.fromKey(t.bucket) }
      // small buckets resolve by one combined collect of their keys
      val (small, big) = rest.partition { case (_, t) => t.cnt <= CollectCap }
      if (small.nonEmpty) {
        val wanted = small.map { case ((g, ci, _), t) => (g, ci, t.bucket) }
        val keys: Map[(String, Int, Long), Array[Long]] = stacked
          .where(bucketCond(wanted, shift))
          .collect()
          .groupBy(r => (r.getString(0), r.getInt(1), r.getLong(2) >> shift))
          .map { case (grp, rows) => grp -> rows.map(_.getLong(2)).sorted }
        small.foreach { case (key @ (g, ci, _), t) =>
          resolved(key) = DoubleOrderKey.fromKey(keys((g, ci, t.bucket))(t.rib.toInt))
        }
      }
      // the rest refine one radix level (≤ 6 rounds total by construction)
      if (big.nonEmpty) {
        val nextShift = math.max(0, shift - RefineBits)
        val wanted = big.map { case ((g, ci, _), t) => (g, ci, t.bucket) }
        val h = collectHist(bucketHist(stacked.where(bucketCond(wanted, shift)), nextShift))
        val prevShift = shift
        active = big.map { case (key @ (g, ci, _), t) =>
          // rank-in-bucket carries over: search sub-buckets of t.bucket only
          key -> locate(h, g, ci, t.rib, Some(b => (b >> (prevShift - nextShift)) == t.bucket))
        }
        shift = nextShift
      } else {
        active = Map.empty
      }
    }
    (totals, resolved.toMap)
  }

  /** floor/ceil((n−1)·q) target ranks for every (group, column) with data. */
  private def interpRanks(
      totals: Map[(String, Int), Long], qs: Seq[Double]): Map[(String, Int), Set[Long]] =
    totals.collect { case (key, nn) if nn > 0 =>
      key -> qs.flatMap { q =>
        val x = (nn - 1) * q
        Seq(math.floor(x).toLong, math.ceil(x).toLong)
      }.toSet
    }

  /** Exact linear-interpolation quantiles for several columns:
    * (column_name, q_r, value_r) — the values at ranks floor/ceil((n−1)·q)
    * come from [[selectRanks]]' zero-shuffle radix selection (Spark's
    * `percentile` is a TypedImperativeAggregate that buffers whole columns —
    * a guaranteed executor OOM at 100 TB; the r5–r18 kernel here
    * range-sorted the stacked relation, a full shuffle of every data row,
    * which the histogram refinement removes outright: counts shuffle,
    * values don't). Same answer and same DuckDB oracle as both former
    * forms: `percentile` and `quantile_cont` share the (n−1)·q
    * interpolation convention (result = lo + (hi − lo)·frac), and the final
    * value goes through Spark's own `round(_, 6)` exactly as before.
    */
  def quantiles(df: DataFrame, cols: Seq[String], qs: Seq[Double]): DataFrame = {
    require(cols.nonEmpty && qs.nonEmpty, "quantiles needs columns and probabilities")
    require(qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantile probabilities must lie in [0, 1] (got ${qs.filterNot(q => q >= 0.0 && q <= 1.0).mkString(", ")})")
    val spark = df.sparkSession
    import spark.implicits._
    val stacked = stackedKeys(df, cols, groupCol = None)
    val (totals, hits) = selectRanks(stacked, interpRanks(_, qs))
    val n = totals.withDefaultValue(0L)
    val rows = for { (c, ci) <- cols.zipWithIndex; q <- qs } yield {
      val nn = n(("", ci))
      val value: Option[Double] =
        if (nn == 0L) None
        else {
          val x  = (nn - 1) * q
          val lo = hits(("", ci, math.floor(x).toLong))
          val hi = hits(("", ci, math.ceil(x).toLong))
          Some(lo + (hi - lo) * (x - math.floor(x)))
        }
      (c, q, value)
    }
    rows
      .toDF("column_name", "q_r", "value_raw")
      .selectExpr("column_name", "q_r", "round(value_raw, 6) AS value_r")
      .orderBy("column_name", "q_r")
  }

  /** Per-group exact interpolated quantiles — [[quantiles]] generalized to a
    * grouping dimension (the per-segment envelope a profiler reports next to
    * the global one). Same zero-shuffle radix-selection kernel
    * ([[selectRanks]]) keyed by (group, column) — never a per-group
    * buffering aggregate and never a one-partition-per-group window sort.
    *
    * Driver state is occupied-bucket counts per (group, column) — built for
    * profiling-grade group cardinality (segments, flags, languages), not
    * for group-by-key explosions; values never reach the driver beyond the
    * ≤ [[CollectCap]]-row target buckets.
    */
  def groupQuantiles(df: DataFrame, groupCol: String, cols: Seq[String], qs: Seq[Double]): DataFrame = {
    require(cols.nonEmpty && qs.nonEmpty, "groupQuantiles needs columns and probabilities")
    require(qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantile probabilities must lie in [0, 1] (got ${qs.filterNot(q => q >= 0.0 && q <= 1.0).mkString(", ")})")
    val spark = df.sparkSession
    import spark.implicits._
    // every group present in the data reports a row per (col, q) — including
    // groups whose column is entirely null (value null, like the SQL twin's
    // GROUP BY); |groups| rows to the driver, the same bound as the rank maps
    val groups: Seq[String] = df
      .selectExpr(s"CAST(`$groupCol` AS STRING) AS grp")
      .where("grp IS NOT NULL")
      .distinct()
      .as[String]
      .collect()
      .sorted
      .toSeq
    val stacked = stackedKeys(df, cols, groupCol = Some(groupCol))
    val (totals, hits) = selectRanks(stacked, interpRanks(_, qs))
    val n = totals.withDefaultValue(0L)
    val rows = for { g <- groups; (c, ci) <- cols.zipWithIndex; q <- qs } yield {
      val nn = n((g, ci))
      val value: Option[Double] =
        if (nn == 0L) None
        else {
          val x  = (nn - 1) * q
          val lo = hits((g, ci, math.floor(x).toLong))
          val hi = hits((g, ci, math.ceil(x).toLong))
          Some(lo + (hi - lo) * (x - math.floor(x)))
        }
      (g, c, q, value)
    }
    rows
      .toDF("grp", "column_name", "q_r", "value_raw")
      .selectExpr("grp", "column_name", "q_r", "round(value_raw, 6) AS value_r")
      .orderBy("grp", "column_name", "q_r")
  }

  def oracleGroupQuantiles(table: String, groupCol: String, cols: Seq[String], qs: Seq[Double]): String =
    cols
      .flatMap { c =>
        qs.map { q =>
          s"""SELECT CAST($groupCol AS VARCHAR) AS grp, '$c' AS column_name, CAST($q AS DOUBLE) AS q_r,
             |  round(quantile_cont(CAST($c AS DOUBLE), $q), 6) AS value_r
             |FROM $table WHERE $groupCol IS NOT NULL GROUP BY $groupCol""".stripMargin
        }
      }
      .mkString("", "\nUNION ALL\n", "\nORDER BY grp, column_name, q_r")

  /** Pairwise correlation ENVELOPE — the cross-column dependency pass of a
    * numeric profiler, published as exact sums, not as a rounded float `r`:
    * per column pair, the pairwise-complete count and the exact decimal sums
    * of x, y, x², y², xy. Pearson's r is driver arithmetic over these five
    * sums; the declared columns are exact (the repo convention after the r7
    * unigram incident: never declare a rounded quotient of a fixed-scale
    * decimal — publish the exact numerators and denominators).
    *
    * Exactness: inputs cast to DECIMAL(19,`inScale`) — exact when the data
    * carries at most `inScale` decimals (the declared lineitem measures are
    * 2-decimal; grep-checked against the testdata) — and decimal×decimal
    * products (scale 2·inScale) are exact, so float summation order never
    * enters. Width 19, not 18: DuckDB backs DECIMAL(≤18) with int64 and its
    * product overflows; 19 forces int128 on its side while Spark's
    * (39, 2s)→(38, 2s) cap still loses no integer headroom the sums need.
    * One scan computes every pair (map-side partial, 1-row exchange),
    * stack-pivoted after aggregation.
    */
  def corrEnvelope(df: DataFrame, pairs: Seq[(String, String)], inScale: Int = 2): DataFrame = {
    require(pairs.nonEmpty, "corrEnvelope needs at least one pair")
    val outScale = 2 * inScale
    def dec(c: String) = col(c).cast(s"decimal(19,$inScale)")
    val aggs = pairs.zipWithIndex.flatMap { case ((x, y), i) =>
      val both = col(x).isNotNull && col(y).isNotNull
      def s(e: Column, name: String) =
        sum(when(both, e)).cast(s"decimal(38,$outScale)").cast("string").as(s"p${i}__$name")
      Seq(
        count(when(both, lit(1))).as(s"p${i}__n"),
        s(dec(x), "sx"), s(dec(y), "sy"),
        s(dec(x) * dec(x), "sxx"), s(dec(y) * dec(y), "syy"), s(dec(x) * dec(y), "sxy")
      )
    }
    val agged = graft.Tables.widen(df).agg(aggs.head, aggs.tail: _*)
    val stackArgs = pairs.zipWithIndex
      .map { case ((x, y), i) =>
        s"'$x', '$y', `p${i}__n`, `p${i}__sx`, `p${i}__sy`, `p${i}__sxx`, `p${i}__syy`, `p${i}__sxy`"
      }
      .mkString(", ")
    agged
      .selectExpr(
        s"stack(${pairs.size}, $stackArgs) AS (x_col, y_col, n, sum_x, sum_y, sum_xx, sum_yy, sum_xy)")
      .orderBy("x_col", "y_col")
  }

  def oracleCorrEnvelope(table: String, pairs: Seq[(String, String)], inScale: Int = 2): String =
    pairs
      .map { case (x, y) =>
        def s(e: String, name: String) =
          s"CAST(CAST(sum(CASE WHEN $x IS NOT NULL AND $y IS NOT NULL THEN $e END) AS DECIMAL(38,${2 * inScale})) AS VARCHAR) AS $name"
        val xd = s"CAST($x AS DECIMAL(19,$inScale))"
        val yd = s"CAST($y AS DECIMAL(19,$inScale))"
        s"""SELECT '$x' AS x_col, '$y' AS y_col,
           |  count(CASE WHEN $x IS NOT NULL AND $y IS NOT NULL THEN 1 END) AS n,
           |  ${s(xd, "sum_x")}, ${s(yd, "sum_y")},
           |  ${s(s"$xd * $xd", "sum_xx")}, ${s(s"$yd * $yd", "sum_yy")}, ${s(s"$xd * $yd", "sum_xy")}
           |FROM $table""".stripMargin
      }
      .mkString("", "\nUNION ALL\n", "\nORDER BY x_col, y_col")

  /** Winsorized (clipped) envelope — the robust-statistics pass: values are
    * clipped to the [pLo, pHi] exact quantile bounds, and the declared output
    * carries the bounds, the clip counts, and the exact decimal sum of the
    * clipped column. Bounds come from [[quantiles]] (the scale-safe
    * rank-select, rounded to the repo's 6-decimal canonical form) so both
    * engines clip at bit-identical thresholds.
    */
  def winsorizedStats(
      df: DataFrame,
      cols: Seq[String],
      pLo: Double = 0.05,
      pHi: Double = 0.95
  ): DataFrame = {
    require(cols.nonEmpty && pLo < pHi, "winsorizedStats needs columns and pLo < pHi")
    // an all-null column yields null quantile bounds (value_r) — skip it
    // rather than NPE at the driver; the surviving columns still report
    val bounds: Map[String, (Double, Double)] = quantiles(df, cols, Seq(pLo, pHi))
      .collect()
      .filter(r => !r.isNullAt(2))
      .groupBy(_.getString(0))
      .collect { case (c, rows) if rows.length == 2 =>
        val m = rows.map(r => r.getDouble(1) -> r.getDouble(2)).toMap
        c -> ((m(pLo), m(pHi)))
      }
    val keep = cols.filter(bounds.contains)
    if (keep.isEmpty) {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("column_name", StringType), StructField("lo_r", DoubleType),
        StructField("hi_r", DoubleType), StructField("n_nonnull", LongType),
        StructField("n_below", LongType), StructField("n_above", LongType),
        StructField("winsorized_sum", StringType)))
      return df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val aggs = keep.flatMap { c =>
      val (lo, hi) = bounds(c)
      val clipped = when(col(c) < lo, lo).when(col(c) > hi, hi).otherwise(col(c))
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c) < lo, 1L).otherwise(0L)).as(s"${c}__below"),
        sum(when(col(c) > hi, 1L).otherwise(0L)).as(s"${c}__above"),
        sum(when(col(c).isNotNull, clipped).cast("decimal(28,6)"))
          .cast("decimal(28,6)").cast("string").as(s"${c}__wsum")
      )
    }
    val agged = graft.Tables.widen(df).agg(aggs.head, aggs.tail: _*)
    val rows = keep
      .map { c =>
        val (lo, hi) = bounds(c)
        s"${sq(c)}, CAST($lo AS DOUBLE), CAST($hi AS DOUBLE), " +
          s"${bq(c + "__n")}, ${bq(c + "__below")}, ${bq(c + "__above")}, ${bq(c + "__wsum")}"
      }
      .mkString(", ")
    agged
      .selectExpr(
        s"stack(${keep.size}, $rows) AS (column_name, lo_r, hi_r, n_nonnull, n_below, n_above, winsorized_sum)")
      .orderBy("column_name")
  }

  def oracleWinsorizedStats(
      table: String,
      cols: Seq[String],
      pLo: Double = 0.05,
      pHi: Double = 0.95
  ): String =
    cols
      .map { c =>
        s"""SELECT '$c' AS column_name, b.lo AS lo_r, b.hi AS hi_r,
           |  count($c) AS n_nonnull,
           |  CAST(sum(CASE WHEN $c < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
           |  CAST(sum(CASE WHEN $c > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
           |  CAST(CAST(sum(CAST(CASE WHEN $c < b.lo THEN b.lo WHEN $c > b.hi THEN b.hi ELSE $c END
           |    AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS VARCHAR) AS winsorized_sum
           |FROM $table, (SELECT round(quantile_cont(CAST($c AS DOUBLE), $pLo), 6) AS lo,
           |                     round(quantile_cont(CAST($c AS DOUBLE), $pHi), 6) AS hi
           |              FROM $table) b
           |GROUP BY b.lo, b.hi
           |HAVING count($c) > 0""".stripMargin
      }
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")

  def oracleQuantiles(table: String, cols: Seq[String], qs: Seq[Double]): String =
    cols
      .flatMap { c =>
        qs.map { q =>
          s"""SELECT '$c' AS column_name, CAST($q AS DOUBLE) AS q_r,
             |  round(quantile_cont(CAST($c AS DOUBLE), $q), 6) AS value_r
             |FROM $table""".stripMargin
        }
      }
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name, q_r")

  // --- percentile bucketing (the scale-safe NTILE) ---------------------------

  /** Equi-depth bucketing of a column into `k` cohorts — what analysts reach
    * for NTILE(k) to do, WITHOUT NTILE's scale-killer: an empty
    * `partitionBy()` window funnels the whole table through ONE partition's
    * sort. Here the k−1 boundaries come from the rank-select [[quantiles]]
    * pass (two scans, per-partition counters, ≤2(k−1) values to the driver),
    * and bucketing is then a per-row CASE over broadcast-scalar bounds — a
    * map-only pass that keeps whole-stage codegen and scales embarrassingly.
    *
    * Boundary semantics: value ≤ boundary_i → bucket i (ties go low), nulls
    * excluded. Boundaries are the round-6 quantile values — the SAME
    * rendering [[quantiles]] declares and its oracle reproduces, so both
    * engines make identical bucket decisions. Emits per bucket the count,
    * bit-exact min/max and the exact decimal sum.
    */
  def percentileBuckets(df: DataFrame, c: String, k: Int = 10): DataFrame = {
    require(k >= 2, s"need at least 2 buckets (got $k)")
    val qs = (1 until k).map(_.toDouble / k)
    val boundRows = quantiles(df, Seq(c), qs).orderBy("q_r").select("value_r").collect()
    if (boundRows.exists(_.isNullAt(0))) {
      // an all-null column (or empty table) has no quantile bounds — report
      // no buckets instead of NPE-ing on the null value_r (the
      // winsorizedStats convention)
      val spark = df.sparkSession
      import spark.implicits._
      return Seq.empty[(Int, Long, Double, Double, String)]
        .toDF("bucket", "n_v", "min_v", "max_v", "sum_str")
    }
    val bounds = boundRows.map(_.getDouble(0))
    val v = col(c).cast("double")
    val bucket = bounds.zipWithIndex.foldRight(lit(k)) { case ((b, i), acc) =>
      when(v <= b, lit(i + 1)).otherwise(acc)
    }
    graft.Tables.widen(df)
      .where(col(c).isNotNull)
      .select(bucket.as("bucket"), v.as("v"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n_v"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"),
        sum(col("v").cast("decimal(28,6)")).cast("decimal(28,6)").cast("string").as("sum_str")
      )
      .orderBy("bucket")
  }

  // --- robust dispersion (median / MAD outlier gate) -------------------------

  /** Median/MAD robust-outlier profile per column — (column_name, median_r,
    * mad_r, n_outliers), where an outlier sits more than `k`·1.4826·MAD
    * from the median (1.4826 ≈ 1/Φ⁻¹(3/4) makes MAD a consistent σ
    * estimator under normality). This is the outlier gate that survives
    * contaminated columns: one corrupt 10¹² row moves a mean/stddev z-score
    * arbitrarily, but moves a median and MAD not at all — which is exactly
    * when you need the gate.
    *
    * Scale shape: two rank-select [[quantiles]] invocations (zero-shuffle
    * radix-histogram selection, bounded driver state — never a buffering
    * percentile aggregate) and ONE map-combined counting scan; nothing
    * holds a column in memory and no data row ever shuffles.
    *
    * Cross-engine determinism: the threshold is computed from the ROUNDED
    * declared median/MAD — the same round-6 rendering both engines already
    * hash-check — with identical left-associated double arithmetic
    * ((k·1.4826)·mad), so the outlier decisions follow the declared
    * columns. Columns that are entirely null are skipped (no median
    * exists), the [[groupQuantiles]] empty-group convention.
    */
  def madStats(df: DataFrame, cols: Seq[String], k: Double = 3.0): DataFrame = {
    require(cols.nonEmpty, "madStats needs at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    def roundedMedians(in: DataFrame, cs: Seq[String]): Map[String, Double] =
      quantiles(in, cs, Seq(0.5))
        .select("column_name", "value_r").collect()
        .collect { case r if !r.isNullAt(1) => r.getString(0) -> r.getDouble(1) }
        .toMap
    val med  = roundedMedians(df, cols)
    val live = cols.filter(med.contains)
    if (live.isEmpty)
      // every requested column entirely null (or the table empty): no median
      // exists anywhere — empty result, matching the oracle's HAVING filter
      return Seq.empty[(String, Double, Double, Long)]
        .toDF("column_name", "median_r", "mad_r", "n_outliers")
    val devs = df.select(live.map(c => abs(col(c).cast("double") - med(c)).as(c)): _*)
    val mad  = roundedMedians(devs, live)
    val counts: Map[String, Long] = {
      val row = df.select(live.map { c =>
        sum(when(abs(col(c).cast("double") - med(c)) > lit(k * 1.4826) * mad(c), 1L)
          .otherwise(0L)).as(c)
      }: _*).collect().head
      live.zipWithIndex.map { case (c, i) => c -> row.getLong(i) }.toMap
    }
    live.map(c => (c, med(c), mad(c), counts(c)))
      .toDF("column_name", "median_r", "mad_r", "n_outliers")
      .orderBy("column_name")
  }

  /** DuckDB twin of [[madStats]]: one UNION branch per column, each
    * computing the round-6 median and MAD with `quantile_cont` (the same
    * (n−1)·q interpolation as [[quantiles]]) and counting deviations beyond
    * the identically-associated `(k·1.4826)·mad_r` threshold.
    */
  def oracleMadStats(table: String, cols: Seq[String], k: Double = 3.0): String =
    cols.map { c =>
      s"""SELECT * FROM (
         |WITH m AS (
         |  SELECT round(quantile_cont(CAST($c AS DOUBLE), 0.5), 6) AS med FROM $table),
         |d AS (
         |  SELECT round(quantile_cont(abs(CAST(t.$c AS DOUBLE) - m.med), 0.5), 6) AS mad
         |  FROM $table t CROSS JOIN m)
         |SELECT '$c' AS column_name, m.med AS median_r, d.mad AS mad_r,
         |  CAST(count(*) FILTER (
         |    abs(CAST(t.$c AS DOUBLE) - m.med) > ($k * 1.4826) * d.mad) AS BIGINT)
         |    AS n_outliers
         |FROM $table t CROSS JOIN m CROSS JOIN d
         |GROUP BY m.med, d.mad
         |HAVING m.med IS NOT NULL)""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")

  // --- exact global ranks (the scale-safe ROW_NUMBER-over-everything) --------

  /** Exact global rank and per-mille percentile of every row by
    * (`valCol`, `keyCol`) — what `row_number() OVER (ORDER BY v)` means,
    * WITHOUT its scale-killer: an empty `partitionBy()` window funnels the
    * entire table through one partition. Here `orderBy` range-partitions
    * the sort across the cluster and `zipWithIndex` assigns global indices
    * with one extra size-count job (per-partition counts → driver prefix
    * offsets — the same two-pass offset trick as [[quantiles]], built into
    * Spark). The unique `keyCol` tiebreak makes the total order — and so
    * the hash — deterministic.
    *
    * The percentile share is EXACT integer arithmetic (1000·rank div n),
    * never a float cume_dist.
    *
    * Columns keep their NATIVE types end to end — the sort ranks the actual
    * values (an early cast-to-long would silently collapse 1.2 and 1.9 into
    * the same rank position on a fractional column; r11 review). Rows with
    * a null value OR null key are excluded (the key is the tiebreak — a
    * null there has no defined position).
    */
  def globalRanks(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val slim = df
      .select(col(keyCol), col(valCol))
      .where(col(valCol).isNotNull && col(keyCol).isNotNull)
    val total = slim.count() // narrow pre-shuffle scan; bounded driver state
    val outSchema = StructType(slim.schema.fields ++ Seq(
      StructField("pos_rank", LongType, nullable = false),
      StructField("pct_millis", LongType, nullable = false)))
    val ranked = slim
      .orderBy(col(valCol), col(keyCol))
      .rdd
      .zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq ++ Seq(i + 1L, 1000L * (i + 1L) / total)) }
    spark.createDataFrame(ranked, outSchema).orderBy(keyCol)
  }

  // --- Benford first-digit audit ---------------------------------------------

  /** Benford's-law first-digit distribution of a monetary column — the
    * classic fabricated-data / fraud screen: naturally-occurring amounts
    * spread over orders of magnitude put digit d first with probability
    * log₁₀(1+1/d); invented numbers don't. Emits per leading digit the
    * count, the observed per-mille share in EXACT integer division, and the
    * round-6 Benford expectation — the consumer compares the two columns.
    *
    * Determinism: the leading digit comes from the STRING RENDERING OF AN
    * INTEGER (the value at `scale` decimals, half-up), never from
    * log10-of-a-double digit math — integer-to-string is identical across
    * engines where float log10 near a power of 10 is not. Zero values at
    * that scale are excluded (no leading digit).
    *
    * Scale shape: per-row digit extraction inside codegen → map-combined
    * groupBy on ≤9 keys → broadcast 1-row total for the exact share. The
    * exchange carries 9 rows.
    */
  def benford(df: DataFrame, c: String, scale: Int = 2): DataFrame = {
    val units = round(col(c).cast("double") * math.pow(10, scale).toLong, 0).cast("long")
    val digits = graft.Tables.widen(df)
      .where(col(c).isNotNull && col(c) > 0)
      .select(units.as("u")).where(col("u") > 0)
      .select(substring(col("u").cast("string"), 1, 1).as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("n_total"))
    digits.crossJoin(broadcast(total))
      .select(
        col("digit"), col("n"),
        expr("1000 * n div n_total").as("pct_millis"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
          .as("expected_r"))
      .orderBy("digit")
  }

  /** DuckDB twin of [[benford]] — same integer-rendering digit extraction,
    * exact integer share, round-6 log10 expectation (both engines' log10
    * are ≤1 ulp from correctly rounded; every Benford constant sits ≥10⁻⁷
    * from a round-6 boundary, so the renderings agree).
    */
  def oracleBenford(table: String, c: String, scale: Int = 2): String =
    s"""WITH u AS (
       |  SELECT CAST(round(CAST($c AS DOUBLE) * ${math.pow(10, scale).toLong}, 0) AS BIGINT) AS u
       |  FROM $table WHERE $c IS NOT NULL AND $c > 0),
       |d AS (
       |  SELECT substr(CAST(u AS VARCHAR), 1, 1) AS digit, count(*) AS n
       |  FROM u WHERE u > 0 GROUP BY 1),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM d)
       |SELECT digit, CAST(n AS BIGINT) AS n,
       |  CAST(1000 * n AS BIGINT) // n_total AS pct_millis,
       |  round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS expected_r
       |FROM d CROSS JOIN t ORDER BY digit""".stripMargin

  /** DuckDB twin of [[percentileBuckets]]: the list-form quantile_cont
    * computes the same boundaries in one aggregate, round-6 like the Spark
    * side's collected `value_r`, then the same ties-go-low CASE.
    */
  def oraclePercentileBuckets(table: String, c: String, k: Int = 10): String = {
    val qsList = (1 until k).map(_.toDouble / k).mkString("[", ", ", "]")
    val cases = (1 until k).map(i => s"WHEN v <= round(qs[$i], 6) THEN $i").mkString(" ")
    s"""WITH b AS (
       |  SELECT quantile_cont(CAST($c AS DOUBLE), $qsList) AS qs FROM $table),
       |x AS (SELECT CAST($c AS DOUBLE) AS v FROM $table WHERE $c IS NOT NULL),
       |bk AS (SELECT CASE $cases ELSE $k END AS bucket, v FROM x CROSS JOIN b)
       |SELECT bucket, count(*) AS n_v, min(v) AS min_v, max(v) AS max_v,
       |  CAST(CAST(sum(CAST(v AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS VARCHAR) AS sum_str
       |FROM bk GROUP BY bucket ORDER BY bucket""".stripMargin
  }
}
