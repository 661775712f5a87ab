package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** Differential fuzz of the structural/report text operators against in-JVM
  * references: the BPE-ish pre-tokenizer (ordered alternation: letter run |
  * digit run | single other symbol), the mixture report with its ROLLUP /
  * CUBE grouping-set bitmasks (a real NULL stratum keeps gid 0 next to the
  * gid-1 subtotal), the enumerated-domain pivot, the vocabulary coverage
  * curve's (count DESC, token) cumulative cut, integer-arithmetic chunking
  * of RAW (unfolded) tokens, Karp-Rabin rolling fingerprints (exact mod-2³¹
  * fold over md5-derived token hashes), per-language rank/percent_rank/ntile,
  * the distributed global length ranks (1000·rank div n per-mille), KWIC
  * first-occurrence slicing, and pairwise top-k vocabulary overlap.
  */
class TextStructFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  // --- reference helpers -----------------------------------------------------

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** `[^ ]+` token count over raw text. */
  private def nToks(text: String): Long = text.split(" ", -1).count(_.nonEmpty).toLong

  /** lowerSimple split keeping empties. */
  private def ts(text: String): Array[String] = TextOps.lowerSimpleJvm(text).split(" ", -1)

  private def reToks(text: String): Seq[String] = ts(text).toSeq.filter(_.nonEmpty)

  /** The BpeRe alternation as an explicit scanner (BMP inputs). */
  private def bpeCount(text: String): Long = {
    def isL(c: Char) = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
    def isD(c: Char) = c >= '0' && c <= '9'
    var i = 0; var n = 0L
    while (i < text.length) {
      val c = text(i)
      if (isL(c)) { while (i < text.length && isL(text(i))) i += 1; n += 1 }
      else if (isD(c)) { while (i < text.length && isD(text(i))) i += 1; n += 1 }
      else if (c == ' ') i += 1
      else { n += 1; i += 1 }
    }
    n
  }

  // --- corpora ---------------------------------------------------------------

  private val words = Array(
    "ab", "cd", "ef12", "12", "a.b", "İq", "ΣΟΦΙΑ", "x!y", "...", "zz")
  private val langsPool   = Array("en", "de", "fr", null)
  private val sourcesPool = Array("web", "books", "code", null)

  private def corpus(seed: Long): Seq[(Long, String, String, String)] = {
    val rnd = new scala.util.Random(seed)
    val n   = 12 + rnd.nextInt(18)
    (0 until n).map { i =>
      val text: String = rnd.nextInt(10) match {
        case 0 => null
        case 1 => ""
        case 2 => words(rnd.nextInt(words.length)) + "  " + words(rnd.nextInt(words.length))
        case 3 => Seq.fill(30 + rnd.nextInt(60))(words(rnd.nextInt(words.length))).mkString(" ")
        case _ => Seq.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.length))).mkString(" ")
      }
      (i.toLong, text, langsPool(rnd.nextInt(langsPool.length)), sourcesPool(rnd.nextInt(sourcesPool.length)))
    }
  }

  private def toDF(docs: Seq[(Long, String, String, String)], parts: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("lang", StringType, nullable = true),
      StructField("source", StringType, nullable = true)
    ))
    spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map { case (id, t, l, s) => Row(id, t, l, s) }, parts), schema)
  }

  private def optLong(r: Row, i: Int): Option[Long] = if (r.isNullAt(i)) None else Some(r.getLong(i))
  private def optStr(r: Row, i: Int): Option[String] = Option(r.getString(i))

  // Option[String] with None (SQL NULL) FIRST in ascending order
  private implicit val nullsFirst: Ordering[Option[String]] =
    Ordering.Option(Ordering.String)

  // --- tests -----------------------------------------------------------------

  test("tokenCounts == ws/BPE/punct scanner reference") {
    for (seed <- 1L to 6L) {
      val docs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 31).nextInt(5)
      val expected = docs.sortBy(_._1).map { case (id, t, _, _) =>
        if (t == null) (id, None, None, None, None)
        else {
          val punct = t.count(c =>
            !((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' ')).toLong
          (id, Some(nToks(t)), Some(bpeCount(t)), Some(punct), Some(t.length.toLong))
        }
      }
      val got = TextOps.tokenCounts(toDF(docs, parts)).collect().toSeq
        .map(r => (r.getLong(0), optLong(r, 1), optLong(r, 2), optLong(r, 3), optLong(r, 4)))
      assert(got == expected, s"seed $seed")
    }
  }

  test("mixture + mixtureRollup + mixtureCube == grouping-set references (NULL strata vs subtotals)") {
    for (seed <- 11L to 16L) {
      val docs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 37).nextInt(5)
      val df    = toDF(docs, parts)
      def tokSum(rows: Seq[(Long, String, String, String)]): Option[Long] = {
        val vs = rows.collect { case (_, t, _, _) if t != null => nToks(t) }
        if (vs.isEmpty) None else Some(vs.sum)
      }
      val strata = docs.groupBy(d => (Option(d._3), Option(d._4)))
      val totalDocs = docs.size.toLong
      val totalToks = tokSum(docs)
      val expMix = strata.toSeq.sortBy(_._1).map { case ((l, s), rows) =>
        val nt = tokSum(rows)
        (l.orNull, s.orNull, rows.size.toLong, nt,
          Some(round6(rows.size.toDouble / totalDocs)),
          nt.map(v => round6(v.toDouble / totalToks.get)))
      }
      val gotMix = TextOps.mixture(df).collect().toSeq.map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), optLong(r, 3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      assert(gotMix == expMix, s"seed $seed mixture")

      def gsRows(sets: Seq[Long]): Seq[(String, String, Long, Long, Option[Long])] =
        sets.flatMap { gid =>
          val grouped = gid match {
            case 0L => strata.toSeq.map { case ((l, s), rows) => (l, s, rows) }
            case 1L => docs.groupBy(d => Option(d._3)).toSeq.map { case (l, rows) => (l, None, rows) }
            case 2L => docs.groupBy(d => Option(d._4)).toSeq.map { case (s, rows) => (None, s, rows) }
            case 3L => Seq((None, None, docs))
          }
          grouped.map { case (l, s, rows) =>
            (l, s, gid, rows, tokSum(rows))
          }
        }.sortBy { case (l, s, gid, _, _) => (gid, l, s) }
          .map { case (l, s, gid, rows, nt) => (l.orNull, s.orNull, gid, rows.size.toLong, nt) }

      val gotRollup = TextOps.mixtureRollup(df).collect().toSeq.map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), optLong(r, 4)))
      assert(gotRollup == gsRows(Seq(0L, 1L, 3L)), s"seed $seed rollup")

      val gotCube = TextOps.mixtureCube(df).collect().toSeq.map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), optLong(r, 4)))
      assert(gotCube == gsRows(Seq(0L, 1L, 2L, 3L)), s"seed $seed cube")
    }
  }

  test("langPivot == enumerated-domain count reference (missing cells 0, off-list langs ignored)") {
    for (seed <- 21L to 26L) {
      val docs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 41).nextInt(5)
      val langs = Seq("en", "de", "xx") // xx: never occurs — all-zero column
      val expected = docs.groupBy(d => Option(d._4)).toSeq.sortBy(_._1).map { case (src, rows) =>
        (src.orNull, langs.map(l => rows.count(_._3 == l).toLong))
      }
      val got = TextOps.langPivot(toDF(docs, parts), langs).collect().toSeq
        .map(r => (r.getString(0), langs.indices.map(i => r.getLong(i + 1)).toList))
      assert(got.map(t => (Option(t._1), t._2)) == expected.map(t => (Option(t._1), t._2.toList)),
        s"seed $seed")
    }
  }

  test("vocabCoverage == cumulative (count DESC, token) reference") {
    for (seed <- 31L to 36L) {
      val docs  = corpus(seed)
      val rnd   = new scala.util.Random(seed * 43)
      val parts = 1 + rnd.nextInt(5)
      val ks    = Seq(1 + rnd.nextInt(3), 5 + rnd.nextInt(10), 50)
      val counts = docs.flatMap(d => if (d._2 == null) Seq.empty else reToks(d._2))
        .groupBy(identity).map { case (t, rows) => t -> rows.size.toLong }
      val ordered = counts.toSeq.sortBy { case (t, n) => (-n, t) }.map(_._2)
      val total = ordered.sum
      val expected = ks.sorted.map { k =>
        val covered = ordered.take(k).sum
        (k, covered, if (total == 0) None else Some(total),
          if (total > 0) Some(round6(covered.toDouble / total)) else None)
      }
      val got = TextOps.vocabCoverage(toDF(docs, parts), ks).collect().toSeq.map(r =>
        (r.getInt(0), r.getLong(1), optLong(r, 2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      assert(got == expected, s"seed $seed ks $ks")
    }
  }

  test("chunks == integer window/stride reference over RAW tokens") {
    for (seed <- 41L to 46L) {
      val docs  = corpus(seed)
      val rnd   = new scala.util.Random(seed * 47)
      val parts  = 1 + rnd.nextInt(5)
      val window = 2 + rnd.nextInt(8)
      val stride = 1 + rnd.nextInt(window)
      val expected = docs.sortBy(_._1).flatMap { case (id, t, _, _) =>
        if (t == null) Seq.empty
        else {
          val tk = t.split(" ", -1).filter(_.nonEmpty)
          val n  = tk.length.toLong
          if (n == 0) Seq.empty
          else {
            val nc = 1 + (if (n > window) (n - window + stride - 1) / stride else 0L)
            (0L until nc).map { i =>
              (id, i, i * stride + 1,
                math.min(n - i * stride, window.toLong),
                tk.slice((i * stride).toInt, (i * stride).toInt + window).mkString(" "))
            }
          }
        }
      }
      val got = TextOps.chunks(toDF(docs, parts), window, stride).collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      assert(got == expected, s"seed $seed window $window stride $stride")
    }
  }

  test("fingerprints == md5-sig + Karp-Rabin rolling reference (exact mod-2³¹ fold)") {
    for (seed <- 51L to 56L) {
      val docs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 53).nextInt(5)
      val expected = docs.sortBy(_._1).map { case (id, t, _, _) =>
        if (t == null) (id, None, None, None)
        else {
          val norm = TextOps.lowerSimpleJvm(t.replaceAll("\\s+", " "))
          val fp   = md5hex(norm)
          val sig  = java.lang.Long.parseLong(fp.take(15), 16)
          val ths  = norm.split(" ", -1).filter(_.nonEmpty)
            .map(tok => java.lang.Long.parseLong(md5hex(tok).take(8), 16))
          val roll =
            if (ths.isEmpty) 0L
            else ths.tail.foldLeft(ths.head)((acc, x) => (acc * TextOps.RollBase + x) % TextOps.RollPrime)
          (id, Some(fp), Some(sig), Some(roll))
        }
      }
      val got = TextOps.fingerprints(toDF(docs, parts)).collect().toSeq.map(r =>
        (r.getLong(0), optStr(r, 1), optLong(r, 2), optLong(r, 3)))
      assert(got == expected, s"seed $seed")
    }
  }

  test("qualityRank == per-language rank/percent_rank/ntile reference (NULL lang group, NULL counts last)") {
    for (seed <- 61L to 66L) {
      val docs  = corpus(seed)
      val rnd   = new scala.util.Random(seed * 59)
      val parts   = 1 + rnd.nextInt(5)
      val buckets = 2 + rnd.nextInt(4)
      // desc by n_tokens with SQL NULLS LAST, then doc_id
      val expected = docs.groupBy(d => Option(d._3)).toSeq.sortBy(_._1).flatMap { case (lang, rows) =>
        val ordered = rows
          .map { case (id, t, _, _) => (id, Option(t).map(nToks)) }
          .sortBy { case (id, nt) => (nt.isEmpty, nt.map(v => -v).getOrElse(0L), id) }
        val n = ordered.size
        val size = n / buckets; val rem = n % buckets
        def ntileOf(r: Int): Long = // r is 1-based
          if (r <= rem * (size + 1)) ((r - 1) / (size + 1) + 1).toLong
          else (rem + (r - 1 - rem * (size + 1)) / size + 1).toLong
        ordered.zipWithIndex.map { case ((id, nt), idx) =>
          val rnk = idx + 1
          val pct = if (n == 1) 0.0 else idx.toDouble / (n - 1)
          (id, lang.orNull, nt, rnk.toLong, pct, ntileOf(rnk))
        }
      }
      val got = TextOps.qualityRank(toDF(docs, parts), buckets).collect().toSeq.map(r =>
        (r.getLong(0), r.getString(1), optLong(r, 2), r.getLong(3), r.getDouble(4), r.getLong(5)))
      assert(got == expected, s"seed $seed buckets $buckets")
    }
  }

  test("lengthRanks == distributed global rank reference (1000·rank div n; NULL counts excluded)") {
    for (seed <- 71L to 76L) {
      val docs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 61).nextInt(5)
      val scored = docs.collect { case (id, t, _, _) if t != null => (id, reToks(t).size.toLong) }
      val n = scored.size.toLong
      val expected = scored.sortBy { case (id, nt) => (nt, id) }.zipWithIndex
        .map { case ((id, nt), idx) => (id, nt, idx + 1L, 1000L * (idx + 1L) / n) }
        .sortBy(_._1)
      val got = TextOps.lengthRanks(toDF(docs, parts)).collect().toSeq.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got == expected, s"seed $seed")
    }
  }

  test("kwic == first-occurrence context-slice reference (fold-only matches included)") {
    for (seed <- 81L to 86L; term <- Seq("ab", "iq", "σοφια")) {
      val docs   = corpus(seed)
      val rnd    = new scala.util.Random(seed * 67)
      val parts  = 1 + rnd.nextInt(5)
      val window = 1 + rnd.nextInt(4)
      val expected = docs.sortBy(_._1).flatMap { case (id, t, _, _) =>
        if (t == null) Seq.empty
        else {
          val tk  = reToks(t)
          val pos = tk.indexOf(term) + 1 // 1-based; 0 if absent
          if (pos <= 0) Seq.empty
          else {
            val lo = math.max(1, pos - window)
            val hi = math.min(tk.size, pos + window)
            Seq((id, pos.toLong, tk.slice(lo - 1, hi).mkString(" ")))
          }
        }
      }
      val got = TextOps.kwic(toDF(docs, parts), term, window).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(got == expected, s"seed $seed term $term window $window")
    }
  }

  test("vocabOverlap == pairwise top-k shortlist reference (NULL source never pairs)") {
    for (seed <- 91L to 96L) {
      val docs  = corpus(seed)
      val rnd   = new scala.util.Random(seed * 71)
      val parts = 1 + rnd.nextInt(5)
      val k     = 2 + rnd.nextInt(6)
      val top = docs.flatMap { case (_, t, _, src) =>
        if (t == null) Seq.empty else reToks(t).map(tok => (Option(src), tok))
      }
        .groupBy(identity).map { case ((src, tok), rows) => (src, tok, rows.size.toLong) }
        .groupBy(_._1).map { case (src, rows) =>
          src -> rows.toSeq.sortBy { case (_, tok, n) => (-n, tok) }.take(k).map(_._2).toSet
        }
      val srcs = top.keys.collect { case Some(s) => s }.toSeq.sorted
      val expected = (for {
        i <- srcs.indices; j <- i + 1 until srcs.size
        shared = (top(Some(srcs(i))) intersect top(Some(srcs(j)))).size.toLong
        if shared > 0
      } yield (srcs(i), srcs(j), shared, shared.toDouble / (2L * k - shared))).toSeq
      val got = TextOps.vocabOverlap(toDF(docs, parts), k).collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(got == expected, s"seed $seed k $k")
    }
  }
}
