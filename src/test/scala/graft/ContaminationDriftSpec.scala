package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Contamination
import graft.model.{ColumnProfile, PiiLevel, SemanticType}
import graft.stats.ProfileDrift

/** Contamination screening + profile drift. The declared contamination
  * query's cross-engine agreement rides the oracle gate; these specs prove
  * the leak-detection and monitoring semantics on planted fixtures.
  */
class ContaminationDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("contaminatedPairs: verbatim quote inside a long doc is caught, clean docs are not") {
    val benchText = "the quick brown fox jumps over the lazy dog today"
    val leaked    = s"prefix words here $benchText and much more trailing content follows"
    val clean     = "completely unrelated content with different vocabulary entirely present"
    val df = docs(
      (1L, benchText), // the benchmark doc
      (2L, leaked),    // contains the benchmark verbatim → contaminated
      (3L, clean)
    )
    val bench = Seq(1L).toDF("doc_id")
    val hits = Contamination.contaminatedPairs(df, bench, minShared = 5L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bench_doc_id"), r.getAs[Long]("shared")))
    assert(hits.map(h => (h._1, h._2)).toSeq == Seq((2L, 1L)), s"got ${hits.toSeq}")
    // a 10-token quote embeds 8 of the benchmark's shingles
    assert(hits.head._3 >= 5L)
  }

  test("contaminatedPairs: df-cap drops hot shingles but never invents pairs") {
    val common = "alpha beta gamma alpha beta gamma alpha beta gamma"
    val df = docs((1L, common), (2L, common), (3L, common), (4L, common))
    val bench = Seq(1L).toDF("doc_id")
    val uncapped = Contamination.contaminatedPairs(df, bench, minShared = 1L).collect()
    val capped = Contamination.contaminatedPairs(df, bench, minShared = 1L, maxShingleDf = Some(2)).collect()
    assert(uncapped.length == 3)  // every other doc shares everything
    assert(capped.length <= uncapped.length)
  }

  test("contaminatedPairsBloom ≡ contaminatedPairs: the Bloom prune changes cost, never the answer") {
    val benchText = "the quick brown fox jumps over the lazy dog today"
    val leaked    = s"prefix words here $benchText and much more trailing content follows"
    val clean     = "completely unrelated content with different vocabulary entirely present"
    val other     = "someone else entirely wrote this particular string of words right here"
    val df = docs((1L, benchText), (2L, leaked), (3L, clean), (4L, other), (5L, leaked + " twice over"))
    val bench = Seq(1L).toDF("doc_id")
    for (minShared <- Seq(1L, 5L)) {
      val exact = Contamination.contaminatedPairs(df, bench, minShared).collect().toSeq
      val bloom = Contamination.contaminatedPairsBloom(df, bench, minShared).collect().toSeq
      assert(bloom == exact, s"minShared=$minShared")
    }
  }

  test("profile drift: added/removed/type/pii/ratio shifts, tolerance suppresses noise") {
    def p(name: String, t: SemanticType, pii: PiiLevel, nullR: Double, uniqR: Double) =
      ColumnProfile(originalName = name, suggestedName = name, dataType = t,
        piiLevel = pii, nullRatio = nullR, uniqueRatio = uniqR)
    val before = Seq(
      p("a", SemanticType.Numeric, PiiLevel.None, 0.00, 1.0),
      p("b", SemanticType.Text, PiiLevel.None, 0.10, 0.5),
      p("gone", SemanticType.Text, PiiLevel.None, 0.0, 0.1)
    )
    val after = Seq(
      p("a", SemanticType.Numeric, PiiLevel.None, 0.02, 1.0),  // 2% shift < tolerance
      p("b", SemanticType.Email, PiiLevel.High, 0.40, 0.5),    // type + pii + null shift
      p("fresh", SemanticType.Date, PiiLevel.None, 0.0, 0.9)
    )
    val ds = ProfileDrift.drift(before, after, ratioTolerance = 0.05)
    val byKey = ds.map(d => (d.columnName, d.change) -> d).toMap
    assert(byKey.contains(("gone", "removed")))
    assert(byKey(("fresh", "added")).newValue == SemanticType.Date.toString)
    assert(byKey(("b", "data_type")).newValue == SemanticType.Email.toString)
    assert(byKey(("b", "pii_level")).newValue == PiiLevel.High.toString)
    assert(byKey.contains(("b", "null_ratio")))
    assert(!ds.exists(_.columnName == "a"), s"tolerance should suppress a's 2% shift: $ds")
  }

  test("portable drift DF: categorical values in string columns, ratios in numeric columns, sentinels elsewhere") {
    def p(name: String, t: SemanticType, pii: PiiLevel, nullR: Double, uniqR: Double) =
      ColumnProfile(originalName = name, suggestedName = name, dataType = t,
        piiLevel = pii, nullRatio = nullR, uniqueRatio = uniqR)
    val before = Seq(
      p("b", SemanticType.Text, PiiLevel.None, 0.10, 0.5),
      p("gone", SemanticType.Text, PiiLevel.None, 0.0, 0.1)
    )
    val after = Seq(p("b", SemanticType.Email, PiiLevel.High, 0.40, 0.5))
    val rows = ProfileDrift.driftPortableDF(spark, before, after, ratioTolerance = 0.05).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getString(2), r.getString(3), r.getDouble(4), r.getDouble(5))).toMap
    // categorical rows: portable .value vocabulary + 0.0 numeric sentinels
    assert(rows(("b", "data_type")) == (("text", "email", 0.0, 0.0)))
    assert(rows(("b", "pii_level")) == (("none", "high", 0.0, 0.0)))
    assert(rows(("gone", "removed")) == (("text", "", 0.0, 0.0)))
    // ratio rows: '' string sentinels + rounded numerics
    assert(rows(("b", "null_ratio")) == (("", "", 0.1, 0.4)))
    // ordering: (column_name, change)
    val order = ProfileDrift.driftPortableDF(spark, before, after, 0.05).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(order == order.sorted)
  }

  test("profile drift on real data: same table at two scale factors has no schema drift") {
    val eng = new graft.engine.ProfilerEngine()
    val before = eng.analyzeDataFrame(Tables.load(spark, "/root/testdata/sf0.001", "customer")).columnProfiles
    val after  = eng.analyzeDataFrame(Tables.load(spark, "/root/testdata/sf0.01", "customer")).columnProfiles
    val ds = ProfileDrift.drift(before, after, ratioTolerance = 0.10)
    assert(!ds.exists(d => d.change == "added" || d.change == "removed"), s"schema drift: $ds")
    assert(!ds.exists(_.change == "data_type"), s"type drift across SFs: $ds")
  }
}
