package graft.stats

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

/** Bottom-k-by-hash quantile sketch — the MERGEABLE approximate tier of the
  * quantile family, completing the repo's sketch set (HLL distincts, CMS
  * counts, Misra-Gries heavy hitters, and now quantiles): keep the k rows
  * whose md5(row-key) is smallest, estimate quantiles by interpolation over
  * that sample.
  *
  * Why this sketch and not GK/KLL: bottom-k by a DETERMINISTIC hash is
  *  - '''mergeable''': union partials, keep the k smallest — exactly what
  *    Spark's TakeOrderedAndProject already executes (per-partition heaps →
  *    driver merge), so the sketch IS the plan, no custom state;
  *  - '''engine-portable and reproducible''': the same k rows are chosen on
  *    any engine, any partitioning, any day (md5 hex compares as ASCII
  *    identically everywhere) — so the ESTIMATES hash-check cross-engine,
  *    not just their error bound, while a GK/KLL's internal compaction
  *    order would diverge;
  *  - '''uniform''': hashing a unique row key is a uniform row sample, the
  *    textbook bottom-k sketch; estimate error is the sampling error,
  *    O(1/√k) in rank.
  * The exact rank-select pass ([[NumericStats.quantiles]]) remains the
  * declared exact tier; this is the cheap always-on profile tier — one
  * TakeOrdered of k rows replaces two full passes, the trade a 100 TB
  * profiler makes for every non-critical column.
  *
  * The driver holds k×|cols| doubles; interpolation is the same
  * `lo + (hi−lo)·((n−1)q − ⌊…⌋)` rule as the exact tier (≡ quantile_cont),
  * rounded to 6 like every declared quantile.
  */
object BottomKSketch {

  /** The deterministic per-row sample gate: md5 over the concatenated key
    * columns plus a salt. Callers pass a UNIQUE row key: duplicate keys
    * share one hash, making the inclusion of ties at the k boundary
    * engine-arbitrary (Spark's and DuckDB's LIMIT would each pick their
    * own), which breaks the cross-engine reproducibility contract.
    */
  private def hashCol(keyCols: Seq[String], salt: String) =
    md5(concat(concat_ws("_", keyCols.map(c => col(c).cast("string")): _*), lit(":" + salt))
      .cast("binary"))

  /** The k sample rows (value columns only), chosen by smallest hash. Rows
    * with ANY null key column are excluded on BOTH engines: Spark's
    * concat_ws would skip the null where DuckDB's `||` propagates it (NULL
    * hash, NULLS-LAST out of the LIMIT), so without the shared exclusion
    * the two engines would draw different samples (r11 review).
    */
  def bottomKSample(
      df: DataFrame,
      keyCols: Seq[String],
      cols: Seq[String],
      k: Int,
      salt: String
  ): DataFrame =
    graft.Tables.widen(df)
      .where(keyCols.map(c => col(c).isNotNull).reduce(_ && _))
      .select((cols.map(col) :+ hashCol(keyCols, salt).as("__h")): _*)
      .orderBy(col("__h"))
      .limit(k)

  /** Quantile estimates from the bottom-k sample: one row per (column, q),
    * `est_r` rounded to 6. Null sample values are excluded per column; an
    * all-null column estimates null.
    */
  def sketchQuantiles(
      df: DataFrame,
      keyCols: Seq[String],
      cols: Seq[String],
      qs: Seq[Double],
      k: Int = 1024,
      salt: String = "qsk"
  ): DataFrame = {
    require(cols.nonEmpty && qs.nonEmpty, "sketchQuantiles needs columns and probabilities")
    require(qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantile probabilities must lie in [0, 1] (got ${qs.filterNot(q => q >= 0.0 && q <= 1.0).mkString(", ")})")
    val spark  = df.sparkSession
    val sample = bottomKSample(df, keyCols, cols, k, salt).collect()
    val rows = for {
      (c, ci) <- cols.zipWithIndex
      values = sample.iterator.filterNot(_.isNullAt(ci))
        .map(r => r.get(ci).asInstanceOf[Number].doubleValue()).toArray.sorted
      q <- qs
    } yield {
      val est: Any =
        if (values.isEmpty) null
        else {
          val x  = (values.length - 1) * q
          val lo = values(math.floor(x).toInt)
          val hi = values(math.ceil(x).toInt)
          lo + (hi - lo) * (x - math.floor(x))
        }
      Row(c, q, est)
    }
    spark
      .createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1),
        StructType(Seq(
          StructField("column_name", StringType, nullable = false),
          StructField("q_r", DoubleType, nullable = false),
          StructField("est_raw", DoubleType, nullable = true)
        ))
      )
      .selectExpr("column_name", "q_r", "round(est_raw, 6) AS est_r")
      .orderBy("column_name", "q_r")
  }

  /** DuckDB twin of [[sketchQuantiles]]: the identical bottom-k selection
    * (same md5 string ordering), quantile_cont over the sample, round 6.
    */
  def oracleSketchQuantiles(
      table: String,
      keyCols: Seq[String],
      cols: Seq[String],
      qs: Seq[Double],
      k: Int = 1024,
      salt: String = "qsk"
  ): String = {
    val keyExpr = keyCols.map(c => s"CAST($c AS VARCHAR)").mkString(" || '_' || ")
    val arms = cols
      .flatMap { c =>
        qs.map { q =>
          s"""SELECT '$c' AS column_name, CAST($q AS DOUBLE) AS q_r,
             |  round(quantile_cont(CAST($c AS DOUBLE), $q), 6) AS est_r
             |FROM s""".stripMargin
        }
      }
      .mkString("\nUNION ALL\n")
    val keyNotNull = keyCols.map(c => s"$c IS NOT NULL").mkString(" AND ")
    s"""WITH s AS (
       |  SELECT ${cols.mkString(", ")} FROM $table
       |  WHERE $keyNotNull
       |  ORDER BY md5($keyExpr || ':$salt') LIMIT $k)
       |$arms
       |ORDER BY column_name, q_r""".stripMargin
  }
}
