package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gate pre-flight + type-adaptive events.ts loader (VERDICT r8 #1/#2: a
  * driver-side testdata regen flipped events.ts LONG→timestamp[us] and took
  * the whole round's gate down; the loader now branches on the scanned type
  * and both gate mains fail fast, loudly, BEFORE running any query).
  */
class PreflightSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def scratch(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_preflight_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("normalizeEventTs: legacy nanos-long branch converts exactly") {
    val df = Seq(1700000000123456L * 1000L).toDF("ts") // µs-aligned nanos
    val out = Tables.normalizeEventTs(df)
    assert(out.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(out.select(unix_micros(col("ts"))).as[Long].head() == 1700000000123456L)
  }

  test("normalizeEventTs: TIMESTAMP_NTZ branch casts via the UTC session zone") {
    val df = Seq(1700000000123456L)
      .toDF("us")
      .select(timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
    val out = Tables.normalizeEventTs(df)
    assert(out.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    // session zone is pinned UTC, so NTZ wall-clock == the same UTC instant
    assert(out.select(unix_micros(col("ts"))).as[Long].head() == 1700000000123456L)
  }

  test("normalizeEventTs: TimestampType passes through unchanged") {
    val df  = Seq(1700000000123456L).toDF("us").select(timestamp_micros(col("us")).as("ts"))
    val out = Tables.normalizeEventTs(df)
    assert(out.select(unix_micros(col("ts"))).as[Long].head() == 1700000000123456L)
  }

  test("normalizeEventTs: an unsupported encoding fails loudly, never silently") {
    val df = Seq("2024-01-01").toDF("ts")
    val e  = intercept[IllegalStateException](Tables.normalizeEventTs(df))
    assert(e.getMessage.contains("events.ts"))
  }

  test("live testdata loads at every SF and ts semantics agree across encodings") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val ev = Tables.load(spark, s"/root/testdata/$sf", "events")
      assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
      assert(ev.where(col("ts").isNull).limit(1).count() == 0)
    }
  }

  test("encoding equivalence: the same events under legacy-long and NTZ ts sessionize identically") {
    // real events re-encoded both ways: the nanos-long form the pre-r8
    // testdata arrived in, and the NTZ form the regen writes now
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events").limit(2000)
    val asLong = ev.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
    val asNtz  = ev.withColumn("ts", col("ts").cast("timestamp_ntz"))
    val a = graft.streaming.Sessionize
      .batchSessions(Tables.normalizeEventTs(asLong)).collect().toSeq
    val b = graft.streaming.Sessionize
      .batchSessions(Tables.normalizeEventTs(asNtz)).collect().toSeq
    assert(a == b, "sessionization differs between ts encodings")
    assert(a.nonEmpty)
  }

  test("preflight: clean testdata reports no drift") {
    assert(Tables.preflight(spark, "/root/testdata/sf0.001").isEmpty)
  }

  test("preflight: a mis-typed events.ts produces the loud named message") {
    val dir = scratch("mistyped")
    // every catalog table present, but events.ts deliberately DOUBLE —
    // an encoding no loader branch supports
    Tables.columns.foreach { case (t, cols) =>
      val src = Tables.load(spark, "/root/testdata/sf0.001", t)
      val out =
        if (t == "events") src.withColumn("ts", col("ts").cast("double"))
        else src
      out.limit(5).select(cols.map(col): _*).coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val drift = Tables.preflight(spark, dir)
    assert(drift.exists(m => m.contains("testdata schema changed") && m.contains("events.ts")), drift.mkString("; "))
  }

  test("preflight: a dtype drift on a non-events column is caught by name") {
    val dir = scratch("dtyped")
    Tables.columns.foreach { case (t, cols) =>
      val src = Tables.load(spark, "/root/testdata/sf0.001", t)
      val out =
        if (t == "customer") src.withColumn("c_acctbal", col("c_acctbal").cast("string"))
        else src
      out.limit(5).coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val drift = Tables.preflight(spark, dir)
    assert(
      drift.exists(m => m.contains("customer.c_acctbal") && m.contains("double") && m.contains("string")),
      drift.mkString("; ")
    )
  }

  test("preflight: a renamed column produces the per-table drift message") {
    val dir = scratch("renamed")
    Tables.columns.foreach { case (t, cols) =>
      val src = Tables.load(spark, "/root/testdata/sf0.001", t)
      val out = if (t == "nation") src.withColumnRenamed("n_name", "nation_name") else src
      out.limit(5).coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val drift = Tables.preflight(spark, dir)
    assert(drift.exists(m => m.contains("nation") && m.contains("nation_name")), drift.mkString("; "))
  }
}
