package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** Differential fuzz of the per-document text-analysis gates (language ID,
  * quality signals, the Gopher rule gate, TF-IDF keywords, n-gram novelty)
  * against in-JVM references. The contracts replayed here are the fiddly
  * ones: split-on-space KEEPS empty tokens (double spaces change the Gopher
  * distinct-ratio denominator but not the regexp token count), NULL text
  * rides three-valued logic (NULL n_tokens, NULL pass_wordcount, but FALSE
  * pass_meanlen and a 'poor'/'und' class), marker hits count OCCURRENCES
  * post-simple-fold (İ/Σ probes), TF-IDF ranks on the ROUNDED score with
  * token tie-break, and novelty's first-seen is min-doc_id over distinct
  * 3-gram shingles.
  */
class QualityGateFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  // --- reference arithmetic --------------------------------------------------

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** tokens(): split(lowerSimple, ' ') — EMPTY TOKENS KEPT. */
  private def ts(text: String): Array[String] =
    TextOps.lowerSimpleJvm(text).split(" ", -1)

  /** `[^ ]+` count — non-space runs of the RAW text. */
  private def nToks(text: String): Long = text.split(" ", -1).count(_.nonEmpty).toLong

  private def isAlnumOrSpace(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' '

  private def shingles(text: String): Seq[String] = {
    val t = ts(text)
    if (t.length < 3) Seq.empty else t.sliding(3).map(_.mkString(" ")).toSeq
  }

  // --- corpora ---------------------------------------------------------------

  private val words = Array(
    "the", "a", "of", "and", "is",          // en markers
    "der", "die", "und", "ist",             // de markers ('und' shared with en's none — 'and' vs 'und' distinct)
    "le", "la", "les", "et", "est",         // fr markers
    "xx", "yyyy", "zzzzzz", "!!", "a.b", "İ", "ΣΟΦΙΑ", "123", "...")

  private def corpus(seed: Long): Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(seed)
    val n   = 14 + rnd.nextInt(20)
    (0 until n).map { i =>
      val text: String = rnd.nextInt(12) match {
        case 0 => null
        case 1 => ""
        case 2 => " " + words(rnd.nextInt(words.length)) + "  " + words(rnd.nextInt(words.length)) + " "
        case 3 => Seq.fill(4 + rnd.nextInt(8))(words(rnd.nextInt(5))).mkString(" ") // marker-dense
        case 4 => Seq.fill(20 + rnd.nextInt(80))(words(rnd.nextInt(words.length))).mkString(" ") // Gopher wordcount band
        case 5 => Seq.fill(3 + rnd.nextInt(5))("!!,@@").mkString(" ") // punct-dense
        case _ => Seq.fill(1 + rnd.nextInt(25))(words(rnd.nextInt(words.length))).mkString(" ")
      }
      (i.toLong, text, Seq("en", "de", "fr", null)(rnd.nextInt(4)))
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

  private def optLong(r: Row, i: Int): Option[Long] = if (r.isNullAt(i)) None else Some(r.getLong(i))
  private def optBool(r: Row, i: Int): Option[Boolean] = if (r.isNullAt(i)) None else Some(r.getBoolean(i))

  // --- tests -----------------------------------------------------------------

  test("langId == occurrence-count argmax with priority tie-break (NULL text → und/NULL)") {
    for (seed <- 1L to 8L) {
      val docs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 31).nextInt(5)
      val expected = docs.sortBy(_._1).map { case (id, text, lang) =>
        if (text == null) (id, lang, "und", None)
        else {
          val t = ts(text)
          val scores = TextOps.langMarkers.map { case (l, ms) => l -> t.count(ms.contains).toLong }
          val mx = scores.map(_._2).max
          val pred = if (mx > 0) scores.find(_._2 == mx).get._1 else "und"
          (id, lang, pred, Some(mx))
        }
      }
      val got = TextOps.langId(toDF(docs, parts)).collect().toSeq
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), optLong(r, 3)))
      assert(got == expected, s"seed $seed")
    }
  }

  test("quality == integer-signal reference (NULL text → NULL counts, 0.0 ratios, poor)") {
    for (seed <- 11L to 18L) {
      val docs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 37).nextInt(5)
      val enMarkers = TextOps.langMarkers.head._2
      val expected = docs.sortBy(_._1).map { case (id, text, _) =>
        if (text == null) (id, None, None, None, None, 0.0, 0.0, "poor")
        else {
          val n     = nToks(text)
          val punct = text.count(c => !isAlnumOrSpace(c)).toLong
          val stops = ts(text).count(enMarkers.contains).toLong
          val len   = text.length.toLong
          val stopRatio  = if (n > 0) stops.toDouble / n else 0.0
          val punctRatio = if (len > 0) punct.toDouble / len else 0.0
          val cls =
            if (n >= 20 && stops >= 1 && punctRatio < 0.1) "good"
            else if (n >= 5) "fair"
            else "poor"
          (id, Some(n), Some(punct), Some(stops), Some(len), stopRatio, punctRatio, cls)
        }
      }
      val got = TextOps.quality(toDF(docs, parts)).collect().toSeq.map(r =>
        (r.getLong(0), optLong(r, 1), optLong(r, 2), optLong(r, 3), optLong(r, 4),
          r.getDouble(5), r.getDouble(6), r.getString(7)))
      assert(got == expected, s"seed $seed")
    }
  }

  test("gopherQuality == rule-gate reference (empty tokens in distinct ratio, 3-valued NULL text)") {
    for (seed <- 21L to 28L) {
      val docs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 41).nextInt(5)
      val enMarkers = TextOps.langMarkers.head._2
      val expected = docs.sortBy(_._1).map { case (id, text, _) =>
        if (text == null)
          // NULL text: NULL n_tokens → NULL pass_wordcount; 0.0-signal rules
          // evaluate FALSE; the conjunction short-circuits to FALSE
          (id, None, 0.0, 0.0, 0L, None, Some(false), Some(false), Some(false), Some(false))
        else {
          val n        = nToks(text)
          val t        = ts(text)
          val tokChars = text.count(_ != ' ').toLong
          val meanLen  = if (n > 0) tokChars.toDouble / n else 0.0
          val distFrac = if (t.nonEmpty) t.distinct.length.toDouble / t.length else 0.0
          val stopDist = enMarkers.count(t.contains).toLong
          val passWc   = n >= TextOps.GopherMinTokens && n <= TextOps.GopherMaxTokens
          val passMwl  = meanLen >= TextOps.GopherMinMeanLen && meanLen <= TextOps.GopherMaxMeanLen
          val passDist = distFrac >= TextOps.GopherMinDistinct
          val passStop = stopDist >= TextOps.GopherMinStopwords
          (id, Some(n), round6(meanLen), round6(distFrac), stopDist,
            Some(passWc), Some(passMwl), Some(passDist), Some(passStop),
            Some(passWc && passMwl && passDist && passStop))
        }
      }
      val got = TextOps.gopherQuality(toDF(docs, parts)).collect().toSeq.map(r =>
        (r.getLong(0), optLong(r, 1), r.getDouble(2), r.getDouble(3), r.getLong(4),
          optBool(r, 5), optBool(r, 6), optBool(r, 7), optBool(r, 8), optBool(r, 9)))
      assert(got == expected, s"seed $seed")
    }
  }

  test("tfidfKeywords == rounded-score rank reference with token tie-break") {
    for (seed <- 31L to 36L) {
      val docs  = corpus(seed)
      val rnd   = new scala.util.Random(seed * 43)
      val parts = 1 + rnd.nextInt(5)
      val k     = 1 + rnd.nextInt(4)
      val bags = docs.collect { case (id, t, _) if t != null => id -> ts(t).filter(_.nonEmpty) }
      val tf = bags.flatMap { case (id, toks) => toks.map(tok => (id, tok)) }
        .groupBy(identity).map { case ((id, tok), rows) => (id, tok) -> rows.size.toLong }
      val dfreq = tf.keys.toSeq.groupBy(_._2).map { case (tok, ks) => tok -> ks.size.toLong }
      val nDocs = docs.size.toLong
      val expected = tf.toSeq
        .map { case ((id, tok), n) =>
          (id, tok, n, dfreq(tok), round6(n * Math.log(nDocs.toDouble / dfreq(tok))))
        }
        .groupBy(_._1).toSeq
        .flatMap { case (_, rows) =>
          rows.sortBy { case (_, tok, _, _, s) => (-s, tok) }
            .take(k).zipWithIndex
            .map { case ((id, tok, n, df, s), r) => (id, (r + 1).toLong, tok, n, df, s) }
        }
        .sortBy(t => (t._1, t._2))
      val got = TextOps.tfidfKeywords(toDF(docs, parts), k).collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      assert(got == expected, s"seed $seed k $k")
    }
  }

  test("novelty == min-doc_id first-seen reference over distinct 3-gram shingles") {
    for (seed <- 41L to 46L) {
      val docs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 47).nextInt(5)
      val perDoc = docs.collect { case (id, t, _) if t != null => id -> shingles(t).distinct }
      val firstSeen = perDoc.flatMap { case (id, sh) => sh.map(_ -> id) }
        .groupBy(_._1).map { case (sh, rows) => sh -> rows.map(_._2).min }
      val expected = docs.sortBy(_._1).map { case (id, _, _) =>
        val sh = perDoc.toMap.getOrElse(id, Seq.empty)
        val novel = sh.count(s => firstSeen(s) == id).toLong
        val r = if (sh.nonEmpty) round6(novel.toDouble / sh.size) else 0.0
        (id, sh.size.toLong, novel, r)
      }
      val got = TextOps.novelty(toDF(docs, parts)).collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(got == expected, s"seed $seed")
    }
  }
}
