package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.text.{BigramLm, Blocklist, SourceDivergence}

/** Round-11i wave: bigram-LM fluency scoring, blocklist phrase tagging,
  * per-source KL divergence.
  */
class R11iOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, dir, "documents")

  // --- bigramScores ----------------------------------------------------------

  test("bigramScores: hand-built corpus — conditional probs, not unigram probs") {
    // corpus: "a b", "a b", "a c" → c(a·)=3, c(a b)=2, c(a c)=1
    val d = Seq((0L, "a b"), (1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val rows = BigramLm.bigramScores(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val lp = (num: Long) =>
      BigDecimal(math.log10(num.toDouble / 3)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(rows(0L)._1 == 1L && BigDecimal(rows(0L)._2) == lp(2))
    assert(rows(2L)._1 == 1L && BigDecimal(rows(2L)._2) == lp(1))
    // identical docs score identically
    assert(rows(0L) == rows(1L))
  }

  test("bigramScores: corpus — every doc present, scores ≤ 0, short docs at 0") {
    val rows = BigramLm.bigramScores(docs).collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val (n, s) = (r.getLong(1), BigDecimal(r.getString(2)))
      if (n == 0) assert(s == 0) else assert(s < 0)
    }
  }

  // --- blocklistHits ---------------------------------------------------------

  test("blocklistHits: replace-length kernel counts substrings and phrases") {
    val d = Seq(
      (0L, "dup dedup vector hash agg"), // dup(2: dup + dedup), vector hash(1), agg(1) = 4
      (1L, "clean text only"),
      (2L, "AGG Agg agg")                // case-folded: 3
    ).toDF("doc_id", "text")
    val rows = Blocklist.blocklistHits(d, Seq("dup", "vector hash", "agg")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rows(0L) == ((4L, true)))
    assert(rows(1L) == ((0L, false)))
    assert(rows(2L) == ((3L, true)))
  }

  test("blocklistHits: corpus — flags exactly the docs containing a phrase") {
    val rows = Blocklist.blocklistHits(docs, SparkEntry.blocklistPhrases).collect()
    assert(rows.length == docs.count())
    val flagged = rows.count(_.getBoolean(2))
    assert(flagged > 0 && flagged < rows.length)
    rows.foreach(r => assert(r.getBoolean(2) == (r.getLong(1) > 0)))
  }

  // --- sourceKl --------------------------------------------------------------

  test("sourceKl: one row per source, KL ≥ 0, token totals partition the corpus") {
    val rows = SourceDivergence.sourceKl(docs).collect()
    val nSources = docs.select("source").distinct().count()
    assert(rows.length == nSources)
    rows.foreach { r =>
      assert(BigDecimal(r.getString(3)) >= 0, s"KL must be non-negative for ${r.getString(0)}")
      assert(r.getLong(2) <= r.getLong(1)) // types ≤ tokens
    }
    val totalToks = docs
      .select(size(split(lower(col("text")), " ")).cast("long").as("n")).agg(sum("n")).head.getLong(0)
    assert(rows.map(_.getLong(1)).sum == totalToks)
  }

  test("sourceKl: a single-source corpus has zero divergence") {
    val d = Seq((0L, "a b c", "s1"), (1L, "a a b", "s1")).toDF("doc_id", "text", "source")
    val rows = SourceDivergence.sourceKl(d).collect()
    assert(rows.length == 1)
    assert(BigDecimal(rows.head.getString(3)) == 0)
  }
}
