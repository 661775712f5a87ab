package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{BigramLm, SourceDivergence, TextOps}

/** Differential fuzz of the corpus-statistics scorers — unigram/bigram LM
  * scores, per-source KL, within-doc repetition, and the top-K histogram /
  * boilerplate cuts — against in-JVM references replaying the declared
  * arithmetic: per-term doubles in the exact declared operation order,
  * DECIMAL(18,6) HALF_UP quantization BEFORE any sum, exact decimal
  * accumulation published as the fixed-scale string, and (count DESC, key)
  * deterministic cut orders. Corpora carry NULL/empty texts, double spaces
  * (empty tokens reach the split-based ops but not the regexp-based ones),
  * NULL sources, repeated-token loops (repetition ≫ 0) and the İ/Σ fold
  * probes.
  */
class CorpusLmFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  // --- reference arithmetic --------------------------------------------------

  private def dec6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  private def round6(x: Double): Double = dec6(x).toDouble

  private def decStr(x: BigDecimal): String = x.underlying.toPlainString

  private val zero6 = BigDecimal(0).setScale(6)

  /** split(lowerSimple, ' ') — empty tokens kept. */
  private def ts(text: String): Array[String] = TextOps.lowerSimpleJvm(text).split(" ", -1)

  /** `[^ ]+` over the folded text — the regexp token stream. */
  private def reToks(text: String): Seq[String] =
    if (text == null) Seq.empty else ts(text).toSeq.filter(_.nonEmpty)

  // --- corpora ---------------------------------------------------------------

  private val words = Array(
    "the", "a", "of", "is", "xx", "yy", "zzz", "a.b", "İq", "ΣΟΦΙΑ", "123", "!?")

  private def corpus(seed: Long): Seq[(Long, String, String)] = {
    val rnd = new scala.util.Random(seed)
    val n   = 12 + rnd.nextInt(18)
    (0 until n).map { i =>
      val text: String = rnd.nextInt(10) match {
        case 0 => null
        case 1 => ""
        case 2 => words(rnd.nextInt(words.length)) + "  " + words(rnd.nextInt(words.length))
        case 3 => // looping doc: one token or bigram repeated — repetition ≫ 0
          val w = words(rnd.nextInt(3))
          Seq.fill(6 + rnd.nextInt(20))(w).mkString(" ")
        case _ => Seq.fill(1 + rnd.nextInt(14))(words(rnd.nextInt(words.length))).mkString(" ")
      }
      (i.toLong, text, Seq("web", "books", "code", null)(rnd.nextInt(4)))
    }
  }

  private def toDF(docs: Seq[(Long, String, String)], parts: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("source", StringType, nullable = true)
    ))
    spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map { case (id, t, s) => Row(id, t, s) }, parts), schema)
  }

  private def optLong(r: Row, i: Int): Option[Long] = if (r.isNullAt(i)) None else Some(r.getLong(i))

  // --- tests -----------------------------------------------------------------

  test("unigramScores == decimal-exact corpus log-prob reference on 8 random corpora") {
    for (seed <- 1L to 8L) {
      val docs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 31).nextInt(5)
      val occ    = docs.flatMap { case (id, t, _) => reToks(t).map(id -> _) }
      val vocab  = occ.groupBy(_._2).map { case (tok, rows) => tok -> rows.size.toLong }
      val nTotal = occ.size.toLong
      val perDoc = occ.groupBy(_._1).map { case (id, rows) =>
        id -> (rows.size.toLong,
          rows.map(r => dec6(Math.log10(vocab(r._2).toDouble / nTotal))).sum)
      }
      val expected = docs.sortBy(_._1).map { case (id, _, _) =>
        val (n, s) = perDoc.getOrElse(id, (0L, zero6))
        (id, n, decStr(s))
      }
      val got = TextOps.unigramScores(toDF(docs, parts)).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(got == expected, s"seed $seed")
    }
  }

  test("bigramScores == conditional log-prob reference (empty tokens inside bigrams)") {
    for (seed <- 11L to 18L) {
      val docs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 37).nextInt(5)
      val occ = docs.flatMap { case (id, t, _) =>
        if (t == null) Seq.empty
        else {
          val tk = ts(t)
          if (tk.length < 2) Seq.empty
          else tk.sliding(2).map(p => (id, p(0), p.mkString(" "))).toSeq
        }
      }
      val bgCounts  = occ.groupBy(r => (r._2, r._3)).map { case (k, rows) => k -> rows.size.toLong }
      val ctxCounts = bgCounts.toSeq.groupBy(_._1._1).map { case (w1, rows) => w1 -> rows.map(_._2).sum }
      val perDoc = occ.groupBy(_._1).map { case (id, rows) =>
        id -> (rows.size.toLong,
          rows.map { case (_, w1, bg) =>
            dec6(Math.log10(bgCounts((w1, bg)).toDouble / ctxCounts(w1)))
          }.sum)
      }
      val expected = docs.sortBy(_._1).map { case (id, _, _) =>
        val (n, s) = perDoc.getOrElse(id, (0L, zero6))
        (id, n, decStr(s))
      }
      val got = BigramLm.bigramScores(toDF(docs, parts)).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(got == expected, s"seed $seed")
    }
  }

  test("sourceKl == per-source divergence reference (NULL source is a group; token-less sources drop)") {
    for (seed <- 21L to 28L) {
      val docs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 41).nextInt(5)
      val occ = docs.flatMap { case (_, t, src) => reToks(t).map(tok => (Option(src), tok)) }
      val bySrcTok = occ.groupBy(identity).map { case (k, rows) => k -> rows.size.toLong }
      val byTok    = occ.groupBy(_._2).map { case (tok, rows) => tok -> rows.size.toLong }
      val bySrc    = occ.groupBy(_._1).map { case (src, rows) =>
        src -> (rows.size.toLong, rows.map(_._2).distinct.size.toLong)
      }
      val nTot = occ.size.toLong
      val expected = bySrc.keys.toSeq.sorted.map { src =>
        val (nS, nTypes) = bySrc(src)
        val sum = bySrcTok.collect { case ((s, tok), cS) if s == src =>
          dec6(cS.toDouble / nS * Math.log10((cS.toDouble * nTot) / (nS.toDouble * byTok(tok))))
        }.sum
        (src.orNull, nS, nTypes, decStr(if (sum == 0) zero6 else sum))
      }
      val got = SourceDivergence.sourceKl(toDF(docs, parts)).collect().toSeq
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      assert(got == expected, s"seed $seed")
    }
  }

  test("repetition == distinct-fraction reference (NULL text → NULL counts, 0.0 ratios)") {
    for (seed <- 31L to 36L) {
      val docs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 43).nextInt(5)
      val expected = docs.sortBy(_._1).map { case (id, text, _) =>
        if (text == null) (id, None, None, None, None, 0.0, 0.0)
        else {
          val t  = ts(text)
          val sh = if (t.length < 3) Array.empty[String] else t.sliding(3).map(_.mkString(" ")).toArray
          def ratio(total: Int, distinct: Int): Double =
            if (total > 0) round6(1.0 - distinct.toDouble / total) else 0.0
          (id, Some(t.length.toLong), Some(t.distinct.length.toLong),
            Some(sh.length.toLong), Some(sh.distinct.length.toLong),
            ratio(t.length, t.distinct.length), ratio(sh.length, sh.distinct.length))
        }
      }
      val got = TextOps.repetition(toDF(docs, parts)).collect().toSeq.map(r =>
        (r.getLong(0), optLong(r, 1), optLong(r, 2), optLong(r, 3), optLong(r, 4),
          r.getDouble(5), r.getDouble(6)))
      assert(got == expected, s"seed $seed")
    }
  }

  test("topTokens / topBigrams / boilerplateShingles == (count DESC, key) cut references") {
    for (seed <- 41L to 46L) {
      val docs  = corpus(seed)
      val rnd   = new scala.util.Random(seed * 47)
      val parts = 1 + rnd.nextInt(5)
      val k     = 1 + rnd.nextInt(8)
      val df    = toDF(docs, parts)

      val tokCounts = docs.flatMap(d => reToks(d._2)).groupBy(identity)
        .map { case (t, rows) => t -> rows.size.toLong }
      val expTok = tokCounts.toSeq.sortBy { case (t, n) => (-n, t) }.take(k)
      val gotTok = TextOps.topTokens(df, k).collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
      assert(gotTok == expTok, s"seed $seed topTokens k $k")

      val bgCounts = docs.flatMap { d =>
        val t = reToks(d._2)
        if (t.length < 2) Seq.empty else t.sliding(2).map(_.mkString(" ")).toSeq
      }.groupBy(identity).map { case (b, rows) => b -> rows.size.toLong }
      val expBg = bgCounts.toSeq.sortBy { case (b, n) => (-n, b) }.take(k)
      val gotBg = TextOps.topBigrams(df, k).collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
      assert(gotBg == expBg, s"seed $seed topBigrams k $k")

      val minDf = 1L + rnd.nextInt(3)
      val dfCounts = docs.flatMap { case (id, t, _) =>
        if (t == null) Seq.empty
        else {
          val tk = ts(t)
          (if (tk.length < 3) Seq.empty[String]
           else tk.sliding(3).map(_.mkString(" ")).toSeq).distinct.map(_ -> id)
        }
      }.groupBy(_._1).map { case (sh, rows) => sh -> rows.size.toLong }
      val expBp = dfCounts.toSeq.filter(_._2 >= minDf).sortBy { case (s, n) => (-n, s) }.take(k)
      val gotBp = TextOps.boilerplateShingles(df, minDf, k).collect().toSeq
        .map(r => (r.getString(0), r.getLong(1)))
      assert(gotBp == expBp, s"seed $seed boilerplate minDf $minDf k $k")
    }
  }
}
