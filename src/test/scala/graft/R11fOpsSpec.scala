package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.stats.NumericStats
import graft.text.TextOps

/** Round-11f wave: exact global ranks without a one-partition window, and
  * the parquet mergeSchema evolution contract.
  */
class R11fOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = Tables.load(spark, dir, "documents")

  // --- globalRanks -----------------------------------------------------------

  test("globalRanks: ties break by key; ranks are a permutation; shares exact") {
    val d = Seq((10L, 5L), (20L, 3L), (30L, 5L), (40L, 1L)).toDF("k", "v")
    val got = NumericStats.globalRanks(d, "k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toList
    // order by (v, k): 40(1) < 20(3) < 10(5) < 30(5, higher key)
    assert(got == List((10L, 3L, 750L), (20L, 2L, 500L), (30L, 4L, 1000L), (40L, 1L, 250L)))
  }

  test("globalRanks: null values drop out and the shares renormalize") {
    val d = Seq((1L, Some(7L)), (2L, None), (3L, Some(2L))).toDF("k", "v")
    val got = NumericStats.globalRanks(d, "k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toList
    assert(got == List((1L, 2L, 1000L), (3L, 1L, 500L)))
  }

  test("globalRanks: fractional values rank by TRUE value order, not a long cast (r11)") {
    // 1.2 < 1.9 but both cast to long 1 — the old cast collapsed them onto
    // the key tiebreak and ranked 1.9 (key 1) before 1.2 (key 2)
    val d = Seq((1L, 1.9), (2L, 1.2), (3L, 0.5)).toDF("k", "v")
    val got = NumericStats.globalRanks(d, "k", "v")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toList
    assert(got == List((1L, 1.9, 3L), (2L, 1.2, 2L), (3L, 0.5, 1L)))
  }

  test("globalRanks: null keys are excluded (no tiebreak position), shares renormalize (r11)") {
    val d = Seq((Some(1L), 7L), (None, 9L), (Some(3L), 2L)).toDF("k", "v")
    val got = NumericStats.globalRanks(d, "k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toList
    assert(got == List((1L, 2L, 1000L), (3L, 1L, 500L)))
  }

  test("quantile edge gates: q outside [0,1] rejected up front; all-null columns degrade, not NPE (r11)") {
    val allNull = Seq((1L, None: Option[Double]), (2L, None)).toDF("k", "v")
    intercept[IllegalArgumentException](NumericStats.quantiles(allNull, Seq("v"), Seq(1.5)))
    intercept[IllegalArgumentException](NumericStats.groupQuantiles(allNull, "k", Seq("v"), Seq(-0.1)))
    // all-null column: percentileBuckets reports no buckets, madStats no rows
    assert(NumericStats.percentileBuckets(allNull, "v", k = 4).count() == 0L)
    assert(NumericStats.madStats(allNull, Seq("v")).count() == 0L)
  }

  test("bottomKSample: rows with a null key column are excluded, matching the oracle's null-propagating concat (r11)") {
    val d = Seq((Some(1L), 10.0), (None, 20.0), (Some(3L), 30.0)).toDF("k", "v")
    val sample = graft.stats.BottomKSketch.bottomKSample(d, Seq("k"), Seq("v"), k = 10, salt = "s")
    assert(sample.collect().map(_.getDouble(0)).toSet == Set(10.0, 30.0))
  }

  test("lengthRanks: rank order agrees with a driver-side sort of the corpus") {
    val rows = TextOps.lengthRanks(docs).collect()
    assert(rows.length == docs.count())
    val expected = rows.map(r => (r.getLong(1), r.getLong(0)))
      .sorted.zipWithIndex.map { case ((_, k), i) => k -> (i + 1L) }.toMap
    rows.foreach(r => assert(r.getLong(2) == expected(r.getLong(0))))
  }

  // --- mergeSchemaRoundTrip --------------------------------------------------

  test("mergeSchemaRoundTrip: old batch backfills the new column as NULL") {
    val path = s"/tmp/graft_merge_spec/${spark.sparkContext.applicationId}"
    val back = graft.io.Sources.mergeSchemaRoundTrip(docs, path, "source", "doc_id")
    assert(back.columns.toSeq == (docs.columns.toSeq :+ "batch"))
    val n = docs.count()
    assert(back.count() == 2 * n)
    assert(back.where(col("batch") === 1 && col("source").isNull).count() == n)
    assert(back.where(col("batch") === 2 && col("source").isNotNull).count() == n)
    // non-evolved columns round-trip bit-exactly in both batches
    val orig = docs.select("doc_id", "text").orderBy("doc_id").collect()
    Seq(1, 2).foreach { b =>
      val got = back.where(col("batch") === b).select("doc_id", "text")
        .orderBy("doc_id").collect()
      assert(got.toSeq == orig.toSeq)
    }
  }
}
