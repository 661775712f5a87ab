package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** Differential fuzz of the retrieval/importance scorers (BM25, DSIR)
  * against in-JVM references replaying the declared arithmetic: simple-fold
  * lowercase (İ→i, Σ→σ) then `[^ ]+` tokenization, per-term doubles in the
  * same IEEE sequence (Math.log / Math.log10 — the Spark codegen calls),
  * DECIMAL(18,6) HALF_UP quantization per term, EXACT decimal per-doc sums,
  * and the (rounded score DESC, doc_id) cut order. Corpora are hostile in
  * the ways the driver data is not: NULL and empty texts (count toward
  * n_docs, carry no tokens), double spaces, İ/Σ words that must fold before
  * matching a query token, punctuation-fused tokens, repeated-token docs
  * (tf ≫ 1), NULL langs, and query tokens with corpus df = 0.
  */
class TextScoreFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  // --- reference arithmetic --------------------------------------------------

  /** lowerSimple + `[^ ]+`: non-space runs of the folded text. */
  private def toks(text: String): Seq[String] =
    if (text == null) Seq.empty
    else TextOps.lowerSimpleJvm(text).split(" ", -1).toSeq.filter(_.nonEmpty)

  /** CAST(double AS DECIMAL(18,6)) — HALF_UP quantization. */
  private def dec6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** BM25 with the Lucene idf over the declared decimal-exact sum. */
  private def refBm25(
      docs: Seq[(Long, String)], query: Seq[String], k: Int, k1: Double, b: Double
  ): Seq[(Long, Double)] = {
    val nDocs = docs.size.toLong
    val dls   = docs.collect { case (id, t) if t != null => id -> toks(t).size.toLong }.toMap
    val sumDl = dls.values.sum
    val avgdl = sumDl.toDouble / nDocs
    val tf = for {
      (id, t) <- docs; tok <- toks(t)
      if query.contains(tok)
    } yield (id, tok)
    val tfCounts = tf.groupBy(identity).map { case ((id, tok), rows) => (id, tok) -> rows.size.toLong }
    val dfreq    = tfCounts.keys.toSeq.groupBy(_._2).map { case (tok, ks) => tok -> ks.size.toLong }
    val scores = tfCounts.toSeq
      .map { case ((id, tok), n) =>
        val df  = dfreq(tok)
        val idf = Math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)
        val tfn = n * (k1 + 1.0) / (n + k1 * (1.0 - b + b * dls(id) / avgdl))
        id -> dec6(idf * tfn)
      }
      .groupBy(_._1)
      .map { case (id, terms) => id -> round6(terms.map(_._2).sum.toDouble) }
      .toSeq
    scores.sortBy { case (id, s) => (-s, id) }.take(k)
  }

  /** DSIR add-α log10 importance weights over the unigram bag. */
  private def refDsir(
      docs: Seq[(Long, String, String)], targetLang: String, alpha: Double
  ): Seq[(Long, Long, Double)] = {
    val occ = for ((id, t, lang) <- docs; tok <- toks(t)) yield (id, tok, lang)
    val counts = occ.groupBy(_._2).map { case (tok, rows) =>
      tok -> (rows.size.toLong, rows.count(_._3 == targetLang).toLong)
    }
    val ns = counts.values.map(_._1).sum
    val nt = counts.values.map(_._2).sum
    val v  = counts.size.toLong
    val lr = counts.map { case (tok, (cs, ct)) =>
      tok -> dec6(
        Math.log10((ct + alpha) / (nt + alpha * v)) -
          Math.log10((cs + alpha) / (ns + alpha * v)))
    }
    val perDoc = occ.groupBy(_._1).map { case (id, rows) =>
      id -> (rows.size.toLong, round6(rows.map(r => lr(r._2)).sum.toDouble))
    }
    docs.map(_._1).sorted.map { id =>
      val (n, w) = perDoc.getOrElse(id, (0L, 0.0))
      (id, n, w)
    }
  }

  // --- corpora ---------------------------------------------------------------

  private val words = Array(
    "aa", "bb", "cc", "the", "x1", "a.b,c", "İstanbul", "ΘΕΟΣ", "ΣΟΦΙΑ", "zz!", "--")
  private val langs = Array("en", "de", "fr", null)

  private def corpus(seed: Long): Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(seed)
    val n   = 14 + rnd.nextInt(20)
    (0 until n).map { i =>
      val text: String = rnd.nextInt(10) match {
        case 0 => null
        case 1 => ""
        case 2 => words(rnd.nextInt(words.length)) * 1 + "  " + words(rnd.nextInt(words.length)) // double space
        case 3 => Seq.fill(8 + rnd.nextInt(20))(words(rnd.nextInt(3))).mkString(" ") // tf ≫ 1
        case _ => Seq.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.length))).mkString(" ")
      }
      (i.toLong, text, langs(rnd.nextInt(langs.length)))
    }
  }

  private def toDF(docs: Seq[(Long, String, String)], parts: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("lang", StringType, nullable = true)
    ))
    spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map { case (id, t, l) => Row(id, t, l) }, parts), schema)
  }

  // --- tests -----------------------------------------------------------------

  test("bm25 == decimal-exact Lucene-idf reference on 8 random corpora") {
    // query tokens are POST-FOLD forms: 'istanbul' only matches via İ→i,
    // 'θεοσ' via Σ→σ; 'q0' never occurs (df = 0 — silently contributes nothing)
    val query = Seq("aa", "the", "istanbul", "θεοσ", "a.b,c", "q0")
    for (seed <- 1L to 8L) {
      val docs  = corpus(seed)
      val rnd   = new scala.util.Random(seed * 31)
      val parts = 1 + rnd.nextInt(5)
      val k     = Seq(5, 10, 1000)(rnd.nextInt(3))
      val (k1, b) = (Seq(1.2, 0.9)(rnd.nextInt(2)), Seq(0.75, 0.4)(rnd.nextInt(2)))
      val expected = refBm25(docs.map(d => (d._1, d._2)), query, k, k1, b)
      val got = TextOps.bm25(toDF(docs, parts), query, k, k1, b).collect().toSeq
        .map(r => (r.getLong(0), r.getDouble(1)))
      assert(got == expected, s"seed $seed k $k k1 $k1 b $b")
    }
  }

  test("dsirWeights + dsirTop == add-α log10 reference on 8 random corpora") {
    for (seed <- 11L to 18L) {
      val docs  = corpus(seed)
      val rnd   = new scala.util.Random(seed * 37)
      val parts = 1 + rnd.nextInt(5)
      val targetLang = Seq("en", "de", "xx")(rnd.nextInt(3)) // xx: empty target slice
      val alpha = Seq(0.5, 0.1)(rnd.nextInt(2))
      val expected = refDsir(docs, targetLang, alpha)
      val got = TextOps.dsirWeights(toDF(docs, parts), targetLang, alpha).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got == expected, s"seed $seed lang $targetLang α $alpha")

      val n = 1 + rnd.nextInt(docs.size)
      val expectedTop = expected.sortBy { case (id, _, w) => (-w, id) }.take(n)
      val gotTop = TextOps.dsirTop(toDF(docs, parts), n, targetLang, alpha).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(gotTop == expectedTop, s"seed $seed top-$n")
    }
  }
}
