package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** Unit behavior of the text-analysis operators on adversarial fixtures
  * (double spaces, punctuation, empty strings, mixed markers). The
  * cross-engine agreement of the same operators is covered by the DuckDB
  * oracle gate (tokencount/textstats/langid/quality/fingerprint_documents).
  */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs(rows: (Long, String, String, String, Long)*) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("tokenCounts: whitespace robustness and BPE-ish splitting") {
    val df = docs(
      (1L, "key  agg row", "en", "s", 12L),   // double space
      (2L, "ab1 cd-2", "en", "s", 8L),
      (3L, "", "en", "s", 0L)
    )
    val m = TextOps.tokenCounts(df).collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Long]("ws_tokens") == 3)
    assert(m(2L).getAs[Long]("bpe_tokens") == 5) // ab,1,cd,-,2
    assert(m(2L).getAs[Long]("punct_count") == 1)
    assert(m(3L).getAs[Long]("ws_tokens") == 0)
  }

  test("langId: argmax with priority tie-break and und fallback") {
    val df = docs(
      (1L, "the cat and the dog", "en", "s", 19L),       // en markers: the,and,the
      (2L, "der hund und die katze", "de", "s", 22L),    // de markers
      (3L, "xyzzy plugh", "en", "s", 11L),               // no markers → und
      (4L, "the der", "en", "s", 7L)                     // tie en=1,de=1 → en (priority)
    )
    val m = TextOps.langId(df).collect().map(r => r.getLong(0) -> r.getAs[String]("pred_lang")).toMap
    assert(m(1L) == "en")
    assert(m(2L) == "de")
    assert(m(3L) == "und")
    assert(m(4L) == "en")
  }

  test("quality: class thresholds") {
    val good = Seq.fill(25)("word").mkString(" ") + " the"
    val df = docs(
      (1L, good, "en", "s", good.length.toLong),
      (2L, "five words here right now", "en", "s", 25L), // fair: 5 tokens, no 'the'... has none
      (3L, "tiny", "en", "s", 4L)
    )
    val m = TextOps.quality(df).collect().map(r => r.getLong(0) -> r.getAs[String]("quality_class")).toMap
    assert(m(1L) == "good")
    assert(m(2L) == "fair")
    assert(m(3L) == "poor")
  }

  test("fingerprints: whitespace/case-insensitive equality, 60-bit sig positive") {
    val df = docs(
      (1L, "Key Agg  Row", "en", "s", 12L),
      (2L, "key agg row", "en", "s", 11L),
      (3L, "key agg rows", "en", "s", 12L)
    )
    val rows = TextOps.fingerprints(df).collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[String]("fp_md5") == byId(2L).getAs[String]("fp_md5"))
    assert(byId(1L).getAs[String]("fp_md5") != byId(3L).getAs[String]("fp_md5"))
    assert(rows.forall(_.getAs[Long]("fp_sig") >= 0L))
  }

  test("repetition: dup token/shingle fractions, short docs report zero") {
    val df = docs(
      (1L, "a b a b a b", "en", "s", 11L),   // 6 tokens {a,b}; shingles: aba,bab,aba,bab → 4, 2 distinct
      (2L, "w x y z", "en", "s", 7L),        // all distinct
      (3L, "hi", "en", "s", 2L)              // too short for any shingle
    )
    val m = TextOps.repetition(df).collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Long]("n_tokens") == 6)
    assert(m(1L).getAs[Long]("n_distinct_tokens") == 2)
    assert(m(1L).getAs[Long]("n_shingles") == 4)
    assert(m(1L).getAs[Long]("n_distinct_shingles") == 2)
    assert(m(1L).getAs[Double]("shingle_rep_ratio") == 0.5)
    assert(m(2L).getAs[Double]("token_rep_ratio") == 0.0)
    assert(m(2L).getAs[Double]("shingle_rep_ratio") == 0.0)
    assert(m(3L).getAs[Long]("n_shingles") == 0)
    assert(m(3L).getAs[Double]("shingle_rep_ratio") == 0.0)
  }

  test("unigramScores: stopword-soup scores high, rare-token doc scores low") {
    // corpus: 'the' appears 6×, rare tokens once each → N = 10
    val df = docs(
      (1L, "the the the", "en", "s", 11L),
      (2L, "the the the", "en", "s", 11L),
      (3L, "qq ww ee rr", "en", "s", 11L),
      (4L, "", "en", "s", 0L)
    )
    val m = TextOps.unigramScores(df).collect().map(r => r.getLong(0) -> r).toMap
    def avg(id: Long): Double =
      m(id).getAs[String]("sum_logprob_str").toDouble / m(id).getAs[Long]("n_tokens")
    assert(m(1L).getAs[Long]("n_tokens") == 3)
    // log10(6/10) each token (sum published as the exact decimal string)
    assert(math.abs(avg(1L) - math.log10(0.6)) < 1e-5)
    assert(math.abs(avg(3L) - math.log10(0.1)) < 1e-5)
    assert(avg(1L) > avg(3L))
    assert(m(4L).getAs[Long]("n_tokens") == 0)
    assert(m(4L).getAs[String]("sum_logprob_str") == "0.000000")
  }

  test("mixture: stratum counts partition the corpus and shares sum to 1") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val rows = TextOps.mixture(docs).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val docShare = rows.map(_.getAs[Double]("doc_share")).sum
    val tokShare = rows.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(docShare - 1.0) < 1e-4 && math.abs(tokShare - 1.0) < 1e-4,
      s"shares sum to $docShare / $tokShare")
    // strata keyed by (lang, source), deterministically ordered
    val keys = rows.map(r => (r.getAs[String]("lang"), r.getAs[String]("source"))).toSeq
    assert(keys == keys.sorted && keys.distinct == keys)
  }

  test("bm25: rare query token dominates the ranking; scores positive; k bounds rows") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val rows = TextOps.bm25(docs, Seq("hash", "join", "dup"), k = 10).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("score_r") > 0.0))
    // the rare token's idf towers over the ubiquitous ones: every doc that
    // contains it must outrank every doc that doesn't
    import org.apache.spark.sql.functions.{col, lower}
    val dupDocs = docs.where(lower(col("text")).contains("dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    if (dupDocs.nonEmpty) {
      val ranked = rows.map(_.getAs[Long]("doc_id"))
      val topWithDup = ranked.takeWhile(dupDocs.contains)
      assert(topWithDup.nonEmpty, s"no dup-doc at the top: ${ranked.toSeq} vs $dupDocs")
    }
  }

  test("dsir weights: target-language docs outweigh non-target docs on average") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val w = TextOps.dsirWeights(docs, targetLang = "en").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val langs = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def avg(ids: Iterable[Long]) = { val v = ids.map(w); v.sum / v.size }
    val en    = langs.collect { case (id, "en") => id }
    val other = langs.collect { case (id, l) if l != "en" => id }
    if (en.nonEmpty && other.nonEmpty)
      assert(avg(en) > avg(other),
        s"en avg ${avg(en)} should exceed non-en avg ${avg(other)}")
    // every doc gets a weight; empty-token docs default to 0
    assert(w.keySet == langs.keySet)
  }

  test("textStats: per-lang aggregation with exact-division averages") {
    val df = docs(
      (1L, "a b c", "en", "s", 5L),
      (2L, "d e", "en", "s", 3L),
      (3L, "f", "de", "s", 1L)
    )
    val m = TextOps.textStats(df).collect().map(r => r.getAs[String]("lang") -> r).toMap
    assert(m("en").getAs[Long]("n_docs") == 2)
    assert(m("en").getAs[Long]("total_tokens") == 5)
    assert(m("en").getAs[Double]("avg_tokens") == 2.5)
    assert(m("de").getAs[Long]("max_chars") == 1)
  }

  test("gopherQuality: each rule fires independently; gate is the conjunction") {
    // 28 distinct 5-char tokens + two stopword markers → 30 tokens, mean len
    // (140+6)/30 ≈ 4.87 ∈ [4,5], distinct 1.0, stopwords 2 → passes all
    val goodText = (1 to 28).map(i => f"tok$i%02d").mkString(" ") + " the and"
    val df = docs(
      (1L, goodText, "en", "s", goodText.length.toLong),
      (2L, "the and " + (1 to 5).map(i => f"tok$i%02d").mkString(" "), "en", "s", 40L), // 7 tokens < 20, mean 31/7≈4.43 ok
      (3L, (1 to 28).map(_ => "aa").mkString(" ") + " the and", "en", "s", 90L),       // mean len 2.13 < 4
      (4L, (1 to 28).map(_ => "word").mkString(" ") + " the and", "en", "s", 148L),    // distinct 3/30 = 0.1
      (5L, (1 to 28).map(i => f"tk$i%02d").mkString(" ") + " tok tok", "en", "s", 148L) // 0 stopwords
    )
    val m = TextOps.gopherQuality(df).collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Boolean]("pass_gopher"), m(1L).toString)
    assert(!m(2L).getAs[Boolean]("pass_wordcount") && m(2L).getAs[Boolean]("pass_meanlen"))
    assert(!m(3L).getAs[Boolean]("pass_meanlen") && m(3L).getAs[Boolean]("pass_wordcount"))
    assert(!m(4L).getAs[Boolean]("pass_distinct") && m(4L).getAs[Boolean]("pass_stopwords"))
    assert(!m(5L).getAs[Boolean]("pass_stopwords") && m(5L).getAs[Boolean]("pass_distinct"))
    assert(Seq(2L, 3L, 4L, 5L).forall(!m(_).getAs[Boolean]("pass_gopher")))
    // stop_distinct counts DISTINCT markers: 'the the the' is 1, not 3
    val rep = docs((9L, "the the the x", "en", "s", 13L))
    assert(TextOps.gopherQuality(rep).collect().head.getAs[Long]("stop_distinct") == 1L)
  }

  test("tfidfKeywords: rare terms outrank common ones; deterministic tie-break; k bound") {
    val df = docs(
      (1L, "zebra common common", "en", "s", 19L),
      (2L, "common apple", "en", "s", 12L),
      (3L, "common banana", "en", "s", 13L)
    )
    val rows = TextOps.tfidfKeywords(df, k = 2).collect()
    val byDoc = rows.groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getAs[Long]("rank"))).toMap
    // doc 1: zebra df=1 idf=ln3 ≈ 1.0986 beats common tf=2 df=3 idf=0
    assert(byDoc(1L).head.getAs[String]("token") == "zebra")
    assert(byDoc(1L).map(_.getAs[String]("token")).toSeq == Seq("zebra", "common"))
    // ranks within k, per-doc row count ≤ k, rank starts at 1
    assert(rows.forall(r => r.getAs[Long]("rank") >= 1L && r.getAs[Long]("rank") <= 2L))
    assert(byDoc.values.forall(_.length <= 2))
    // df=N terms score exactly 0
    assert(byDoc(1L)(1).getAs[Double]("score_r") == 0.0)
  }

  test("novelty: first-seen doc owns the shingle; later copies score low") {
    val a = "alpha beta gamma delta epsilon"         // 3 shingles, all first-seen in doc 1
    val df = docs(
      (1L, a, "en", "s", a.length.toLong),
      (2L, a, "en", "s", a.length.toLong),           // exact copy → novelty 0
      (3L, "zeta eta theta iota kappa", "en", "s", 25L) // all-new → novelty 1
    )
    val m = TextOps.novelty(df).collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Double]("novelty_r") == 1.0)
    assert(m(2L).getAs[Double]("novelty_r") == 0.0)
    assert(m(2L).getAs[Long]("n_shingles") == 3L)
    assert(m(3L).getAs[Double]("novelty_r") == 1.0)
    // too short for a shingle → 0 shingles, ratio 0.0 by convention
    val short = docs((4L, "one two", "en", "s", 7L))
    val r4 = TextOps.novelty(short).collect().head
    assert(r4.getAs[Long]("n_shingles") == 0L && r4.getAs[Double]("novelty_r") == 0.0)
  }

  test("boilerplateShingles: df counts distinct docs, not occurrences; minDf and k cut") {
    val tpl = "lorem ipsum dolor"
    val df = docs(
      (1L, s"$tpl $tpl unique1 a b", "en", "s", 40L), // repeated within doc: df still 1 per doc
      (2L, s"$tpl extra words here", "en", "s", 38L),
      (3L, s"$tpl more other stuff", "en", "s", 38L),
      (4L, "nothing shared at all here", "en", "s", 26L)
    )
    val rows = TextOps.boilerplateShingles(df, minDf = 3L, k = 10).collect()
    val m = rows.map(r => r.getAs[String]("shingle") -> r.getAs[Long]("df")).toMap
    assert(m.get("lorem ipsum dolor").contains(3L), m.toString) // docs 1,2,3 — not 4×
    assert(rows.forall(_.getAs[Long]("df") >= 3L))
  }

  test("vocabCoverage: exact cumulative shares under the (count desc, token asc) order") {
    val df = docs(
      (1L, "a a a b b c", "en", "s", 11L),
      (2L, "d d", "en", "s", 3L)
    ) // counts: a=3, d=2, b=2, c=1 → order a, b, d, c (tie b/d → b first)
    val out = TextOps.vocabCoverage(df, ks = Seq(1, 2, 3, 10)).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1) == ((3L, 8L, 0.375)))
    assert(out(2) == ((5L, 8L, 0.625)))   // a + b (alphabetical tie-break)
    assert(out(3) == ((7L, 8L, 0.875)))
    assert(out(10) == ((8L, 8L, 1.0)))    // k past |vocab| covers everything
  }

  test("mixtureRollup: subtotal rows aggregate their stratum exactly, gid marks the level") {
    val df = docs(
      (1L, "w w w", "en", "s1", 5L),
      (2L, "w w", "en", "s2", 3L),
      (3L, "w", "de", "s1", 1L)
    )
    val rows = TextOps.mixtureRollup(df).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2)) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows((Some("en"), Some("s1"), 0L)) == ((1L, 3L)))
    assert(rows((Some("en"), None, 1L)) == ((2L, 5L)))     // lang subtotal
    assert(rows((Some("de"), None, 1L)) == ((1L, 1L)))
    assert(rows((None, None, 3L)) == ((3L, 6L)))           // grand total
    assert(rows.size == 3 + 2 + 1)
  }

  test("langPivot: enumerated domain, missing cells are 0, out-of-domain langs dropped") {
    val df = docs(
      (1L, "x", "en", "s1", 1L),
      (2L, "x", "en", "s1", 1L),
      (3L, "x", "de", "s1", 1L),
      (4L, "x", "xx", "s2", 1L) // out of the declared domain
    )
    val rows = TextOps.langPivot(df, Seq("de", "en")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows("s1") == ((1L, 2L)))   // n_de=1, n_en=2
    assert(rows("s2") == ((0L, 0L)))   // xx not a column; cells backfilled to 0
  }

  test("chunks: stride windows cover every token, short tail clamped, sub-window docs = one chunk") {
    val df = docs(
      (1L, (1 to 10).map(i => s"t$i").mkString(" "), "en", "s", 30L), // 10 toks → 3 chunks
      (2L, "a b c", "en", "s", 5L),                                   // 3 toks → 1 chunk
      (3L, "p q r s t", "en", "s", 9L)                                // 5 toks → 2 chunks
    )
    val rows = TextOps.chunks(df, window = 4, stride = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(rows.size == 6)
    assert(rows((1L, 0L)) == ((1L, 4L, "t1 t2 t3 t4")))
    assert(rows((1L, 1L)) == ((4L, 4L, "t4 t5 t6 t7")))
    assert(rows((1L, 2L)) == ((7L, 4L, "t7 t8 t9 t10")))
    assert(rows((2L, 0L)) == ((1L, 3L, "a b c")))
    assert(rows((3L, 0L)) == ((1L, 4L, "p q r s")))
    assert(rows((3L, 1L)) == ((4L, 2L, "s t"))) // clamped tail
  }

  test("dsirTop: the cut is exactly the n heaviest docs under the (weight desc, doc_id) total order") {
    val corpus = Tables.load(SparkTestBase.spark, "/root/testdata/sf0.001", "documents")
    val n = 10
    val top = TextOps.dsirTop(corpus, n).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(top.length == n)
    // agrees with ranking the full weights relation the same way
    val all = TextOps.dsirWeights(corpus).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
      .sortBy { case (id, w) => (-w, id) }
    assert(top.toSeq == all.take(n).toSeq)
  }
}
