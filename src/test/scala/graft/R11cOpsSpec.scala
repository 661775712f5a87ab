package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Round-11c wave: KWIC concordance, CSV round-trip, and the AQE skew-join
  * demonstration (the runtime answer to shuffle skew that PLANS.md cites —
  * asserted here so the claim is executable, not prose).
  */
class R11cOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = Tables.load(spark, dir, "documents")

  // --- kwic -----------------------------------------------------------------

  test("kwic: positions are first occurrences and contexts contain the term") {
    val rows = TextOps.kwic(docs, "spark").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ctx = r.getString(2).split(" ")
      assert(ctx.contains("spark"), s"context misses term: ${r.getString(2)}")
      assert(ctx.length <= 7) // ±3 window
    }
    // spot-check first occurrence on one doc driver-side
    val one = docs.where(col("doc_id") === rows.head.getLong(0))
      .select("text").as[String].head()
    val toks = one.toLowerCase.split(" ").filter(_.nonEmpty)
    assert(toks.indexOf("spark") + 1 == rows.head.getLong(1))
  }

  test("kwic: window clamps at document edges") {
    val d = Seq(
      (1L, "spark a b c d", "en", "s", 5L),   // term at position 1: left-clamped
      (2L, "a b c d spark", "en", "s", 5L),   // term at the end: right-clamped
      (3L, "a b c d e", "en", "s", 5L)        // absent: filtered out
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.kwic(d, "spark")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toList
    assert(got == List((1L, 1L, "spark a b c"), (2L, 5L, "b c d spark")))
  }

  // --- csv round-trip -------------------------------------------------------

  test("csvRoundTrip: identity on documents, including empty-vs-null handling") {
    val path = s"/tmp/graft_csv_spec/${spark.sparkContext.applicationId}"
    val back = graft.io.Sources.csvRoundTrip(docs, path, "doc_id").collect()
    val orig = docs.orderBy("doc_id").collect()
    assert(back.toSeq == orig.toSeq)
  }

  // --- AQE skew join --------------------------------------------------------

  test("AQE splits a skewed shuffle-join partition (skew=true in the final plan)") {
    val restore = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // thresholds scaled down so the fixture's hot key trips the optimizer
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      // 100k rows, 90% on one key — the classic hot-key fact side
      val fact = spark.range(100000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
          concat(lit("payload_"), col("id")).as("payload"))
      val dim = spark.range(100000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = fact.join(dim, "k")
      // execute THIS dataframe (count() would plan a separate query and
      // leave joined's adaptive plan unfinalized)
      assert(joined.collect().length == 100000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), s"AQE did not split the skewed partition:\n$p")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
