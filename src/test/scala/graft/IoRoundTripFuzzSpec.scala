package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Sources

/** Fuzz of the interchange round-trips (VERDICT r12 ask #4): random frames
  * carrying the adversarial corpus's hostile content classes — embedded
  * quotes/commas/newlines/tabs, CJK / emoji / RTL / combining marks, empty
  * vs NULL strings, whitespace-only values, negative / zero / extreme-
  * magnitude doubles, and NULLs in every nullable column — written and read
  * back through [[Sources.csvRoundTrip]], [[Sources.jsonlRoundTrip]] and
  * [[Sources.orcRoundTrip]], then compared VALUE-EXACTLY against the source
  * frame. The identity contract is the whole point of an interchange format:
  * what goes in comes out, bit-for-bit, whatever the corpus contains.
  *
  * The one documented CSV reservation — a field whose VALUE is the literal
  * `\N` null marker reads back as NULL — is pinned as its own test, so the
  * trade-off stays visible instead of silently excluded.
  */
class IoRoundTripFuzzSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark

  private val hostileStrings: Seq[String] = Seq(
    "plain", "", " ", "   ", "trailing   ", "   leading",
    "comma, inside", "quote \" double", "single ' quote", "both \"'\" mixed",
    "newline\nembedded", "tab\tseparated", "carriage\rreturn",
    "backslash \\ escape", "pipe|caret^dollar$",
    "的是了在和测试", "😀 🎉 🔥 🚀", "مرحبا بالعالم", "é à vérité déjà vu",
    "İstanbul ΟΔΟΣ ς σ", "a" * 300, "-- comment; DROP",
    "%_% like", "0x1f 1e10 ١٢٣")

  private val doublePool: Seq[java.lang.Double] = Seq(
    0.0, -0.0, 1.5, -42.25, 1e-30, -1e30, 123456.789, 0.1, -7.0)

  private def schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("txt", StringType, nullable = true),
    StructField("num", DoubleType, nullable = true),
    StructField("cnt", LongType, nullable = true),
    StructField("flag", BooleanType, nullable = true)))

  private def randomFrame(seed: Long): DataFrame = {
    val rnd = new scala.util.Random(seed * 733)
    val n = 5 + rnd.nextInt(25)
    val rows = (0 until n).map { i =>
      Row(
        i.toLong,
        if (rnd.nextInt(8) == 0) null else hostileStrings(rnd.nextInt(hostileStrings.length)),
        if (rnd.nextInt(8) == 0) null else doublePool(rnd.nextInt(doublePool.length)),
        if (rnd.nextInt(8) == 0) null else java.lang.Long.valueOf(rnd.nextLong()),
        if (rnd.nextInt(8) == 0) null else java.lang.Boolean.valueOf(rnd.nextBoolean()))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  private def canonical(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("CSV round-trip is the identity on 6 random hostile frames") {
    for (seed <- 1L to 6L) {
      val df = randomFrame(seed)
      val back = Sources.csvRoundTrip(df, tmp("graft_csv_fuzz") + "/d", "id")
      assert(canonical(back) == canonical(df), s"seed=$seed: CSV identity broken")
    }
  }

  test("JSONL round-trip is the identity on 6 random hostile frames") {
    for (seed <- 11L to 16L) {
      val df = randomFrame(seed)
      val back = Sources.jsonlRoundTrip(df, tmp("graft_jsonl_fuzz") + "/d", "id")
      assert(canonical(back) == canonical(df), s"seed=$seed: JSONL identity broken")
    }
  }

  test("ORC round-trip is the identity on 6 random hostile frames") {
    for (seed <- 21L to 26L) {
      val df = randomFrame(seed)
      val back = Sources.orcRoundTrip(df, tmp("graft_orc_fuzz") + "/d", "id")
      assert(canonical(back) == canonical(df), s"seed=$seed: ORC identity broken")
    }
  }

  test("documented CSV reservation: a value equal to the null marker reads back NULL") {
    val rows = Seq(Row(1L, Sources.CsvNullMarker, null, null, null),
      Row(2L, "kept", null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val back = Sources.csvRoundTrip(df, tmp("graft_csv_marker") + "/d", "id").collect()
    assert(back(0).isNullAt(1),
      "the \\N-valued field must collapse to NULL — the documented trade-off") // Sources.scala CsvNullMarker
    assert(back(1).getString(1) == "kept")
  }

  test("empty string and NULL stay distinct through every format") {
    val rows = Seq(Row(1L, "", null, null, null), Row(2L, null, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    for ((name, rt) <- Seq[(String, DataFrame => DataFrame)](
        "csv"   -> (d => Sources.csvRoundTrip(d, tmp("graft_ed_csv") + "/d", "id")),
        "jsonl" -> (d => Sources.jsonlRoundTrip(d, tmp("graft_ed_json") + "/d", "id")),
        "orc"   -> (d => Sources.orcRoundTrip(d, tmp("graft_ed_orc") + "/d", "id")))) {
      val back = rt(df).collect()
      assert(back(0).getString(1) == "" && back(1).isNullAt(1),
        s"$name: ''-vs-NULL distinction lost")
    }
  }
}
