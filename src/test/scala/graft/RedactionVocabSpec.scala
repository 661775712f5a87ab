package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.{ApproxVocab, Redaction, TextOps}

/** In-text redaction + bounded-memory vocabulary. The declared redaction
  * query's cross-engine agreement rides the oracle gate; these specs prove
  * the scrubbing and heavy-hitter semantics on planted fixtures.
  */
class RedactionVocabSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("redact: planted email and phone are scrubbed, clean text untouched") {
    val df = docs(
      (1L, "contact me at jane.doe+x@example.co.uk or call +1 555 123 4567 today"),
      (2L, "no pii here just words and the number 42")
    )
    val m = Redaction.redact(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("redacted_text"), r.getAs[Long]("n_redactions"))).toMap
    assert(m(1L)._1 == "contact me at [EMAIL] or call [PHONE] today", m(1L)._1)
    assert(m(1L)._2 == 2L)
    assert(m(2L)._1 == "no pii here just words and the number 42")
    assert(m(2L)._2 == 0L)
    // non-text columns pass through
    val cols = Redaction.redact(df).columns.toSet
    assert(Set("doc_id", "lang", "source", "n_chars", "redacted_text", "n_redactions").subsetOf(cols))
  }

  test("redact: bare integers in running text survive (conservative phone rule)") {
    val df = docs((1L, "the year 2024 had 365 days and 8760000000 microfortnights"))
    val out = Redaction.redact(df).first().getAs[String]("redacted_text")
    assert(out.contains("2024") && out.contains("8760000000"), out)
  }

  test("approxTopTokens recovers the exact top-K on the real corpus") {
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val approx = ApproxVocab.approxTopTokens(real, k = 20).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val exact = TextOps.topTokens(real, 20).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(approx.map(_._1).toSet == exact.map(_._1).toSet,
      s"approx=${approx.toSeq} exact=${exact.toSeq}")
    // CMS estimates are one-sided: est >= true count
    val exactAll = ApproxVocab.exactCounts(real)
    assert(approx.forall { case (t, est) => est >= exactAll(t) })
  }

  test("pinned Misra-Gries at budget >= |vocab| IS the exact top-K") {
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val pinned = ApproxVocab.mgTopTokensPinned(real, k = 20).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = TextOps.topTokens(real, 20).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(pinned == exact, s"pinned=$pinned exact=$exact")
  }

  test("pinned Misra-Gries fails loudly when the budget overflows (no silent approx)") {
    import spark.implicits._
    val df = (0 until 50).map(i => (i.toLong, s"tok$i unique words ${i % 7}"))
      .toDF("doc_id", "text")
    val ex = intercept[org.apache.spark.SparkException] {
      ApproxVocab.mgTopTokensPinned(df, k = 10, counterBudget = 3).collect()
    }
    assert(ex.getMessage.contains("counterBudget") ||
      Option(ex.getCause).exists(_.getMessage.contains("counterBudget")))
  }

  test("count-min sketches merge across slices (incremental vocabulary)") {
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    import org.apache.spark.sql.functions.col
    def sketch(df: org.apache.spark.sql.DataFrame) =
      df.select(org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.lower(col("text")), " ")).as("token"))
        .where(col("token") =!= "")
        .stat.countMinSketch("token", 1e-4, 0.99, 42)
    val whole  = sketch(real)
    val merged = ApproxVocab.mergeSketches(
      sketch(real.where(col("doc_id") < 250)),
      sketch(real.where(col("doc_id") >= 250))
    )
    for (t <- ApproxVocab.exactCounts(real).keys.take(20))
      assert(merged.estimateCount(t) == whole.estimateCount(t), s"token $t")
  }
}
