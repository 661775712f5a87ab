package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.ProfilerEngine
import graft.model.SemanticType

/** The profiler must survive — and classify sensibly — every Spark type a
  * real lakehouse table can carry, not just the scalar fixtures. Per-column
  * error isolation (the reference's try/except per column) means one
  * unprofilable column must never sink the table.
  */
class ExoticTypesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val exotic = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("dec", DecimalType(12, 2)),
      StructField("dt", DateType),
      StructField("tstamp", TimestampType),
      StructField("bin", BinaryType),
      StructField("arr", ArrayType(IntegerType)),
      StructField("strct", StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))),
      StructField("mp", MapType(StringType, IntegerType))
    ))
    val rows = (1 to 30).map { i =>
      Row(
        i.toLong,
        new java.math.BigDecimal(s"$i.25"),
        java.sql.Date.valueOf(f"2024-01-${(i % 28) + 1}%02d"),
        java.sql.Timestamp.valueOf(f"2024-01-01 10:${i % 60}%02d:00"),
        s"bytes$i".getBytes("UTF-8"),
        Array(i, i + 1),
        Row(i, s"s$i"),
        Map(s"k$i" -> i)
      )
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("every exotic column profiles without sinking the table") {
    val profiles = new ProfilerEngine().analyzeDataFrame(exotic).columnProfiles
    val byName = profiles.map(p => p.originalName -> p).toMap
    // at minimum, all columns that Spark can stringify+compare must profile
    assert(byName.contains("id") && byName.contains("dec") && byName.contains("dt"))
    assert(byName("id").dataType == SemanticType.Identifier) // "id" name + unique
    assert(byName("dec").dataType == SemanticType.Numeric)   // "12.25" matches decimal
    assert(byName("dt").dataType == SemanticType.Date)       // ISO rendering
    assert(byName("dt").uniqueRatio > 0.9)
    // map column distinct-counts via its string rendering (documented deviation)
    if (byName.contains("mp")) assert(byName("mp").uniqueCount == 30)
    // arrays/structs render to strings; they should land on a deterministic
    // type (text or business_key fallback), never crash
    for (c <- Seq("arr", "strct", "bin") if byName.contains(c))
      assert(byName(c).dataType != null)
  }

  test("all-null and single-value columns classify deterministically") {
    import spark.implicits._
    val df = Seq.fill(20)((Option.empty[String], "const")).toDF("nulls", "constant")
    val p = new ProfilerEngine().analyzeDataFrame(df).columnProfiles.map(x => x.originalName -> x).toMap
    assert(p("nulls").dataType == SemanticType.Text) // nn == 0 → text
    assert(p("nulls").nullRatio == 1.0)
    assert(p("constant").dataType == SemanticType.BusinessKey) // 1/20 < 0.1 uniq, n > 10
  }

  test("Data Vault hub/satellite generation handles decimal and date keys") {
    val hub = graft.vault.DataVault.hub(exotic, "exotic", Seq("id"))
    assert(hub.count() == 30)
    val sat = graft.vault.DataVault.satellite(exotic, "exotic", Seq("id"), Seq("dec", "dt"))
    assert(sat.select("hashdiff").distinct().count() == 30)
  }
}
