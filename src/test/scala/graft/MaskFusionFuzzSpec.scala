package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.{HybridSearch, SimilarityOps}
import graft.stats.MultiPatternMask
import graft.text.{Blocklist, TextOps}

/** Differential fuzz of three previously fixture-only seams:
  *
  *   - [[MultiPatternMask]] — the native pattern-bank expression on the
  *     profiler's hot path — against per-pattern `java.util.regex.find()`
  *     (the exact semantics the bank claims), over random banks drawn from a
  *     pool that includes the production regexes, anchored/unanchored/unicode
  *     customs, and `^$`. Evaluated TWICE per corpus: once under default
  *     whole-stage codegen (the `doGenCode` path) and once with codegen
  *     forced off (the `nullSafeEval` path) — the two engine paths must agree
  *     with each other and with the reference, including null passthrough.
  *
  *   - [[Blocklist]] — the replace-length phrase counter — against an in-JVM
  *     non-overlapping left-to-right `indexOf` count over the same
  *     simple-case-folded text (İ/Σ pre-fold), on random documents with
  *     planted/cased/overlapping phrases ("aaaa" ∋ "aa" exactly twice).
  *
  *   - [[HybridSearch.rrfHybrid]] — reciprocal-rank fusion — against a
  *     fusion reference built from the two tier outputs themselves (each
  *     tier has its own differential fuzz elsewhere): on random corpora and
  *     random embeddings, the fused relation must be exactly the full outer
  *     join of the two top-k lists with floor(10⁹/(c+rank)) integer terms
  *     and (rrf_e9 desc, doc_id) order — no doc invented, none dropped.
  */
class MaskFusionFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  // --- MultiPatternMask ------------------------------------------------------

  private val regexPool: Seq[String] =
    graft.pattern.PatternRules.measuredPatterns.map(_.regex) ++ Seq(
      "^a+b", "\\d{3}", "(?i)FOO", "σ+", "^$", "[0-9]{2,4}-", "\\bword\\b", "^\\s+$"
    )

  private def drawMaskStr(rnd: scala.util.Random): Option[String] =
    rnd.nextInt(14) match {
      case 0 => None
      case 1 => Some("")
      case 2 => Some("aaab")
      case 3 => Some("FOO bar")
      case 4 => Some("σσ İ")
      case 5 => Some(s"u${rnd.nextInt(30)}@ex.com")
      case 6 => Some("1" * (8 + rnd.nextInt(9)))
      case 7 => Some("   ")
      case 8 => Some("x" * 300 + "123-")
      case 9 => Some("word")
      case _ => Some(s"txt ${rnd.nextInt(30)} word${rnd.nextInt(4)}")
    }

  private def maskOf(bank: Seq[String], s: String): Long = {
    var m = 0L
    for ((r, i) <- bank.zipWithIndex)
      if (java.util.regex.Pattern.compile(r).matcher(s).find()) m |= 1L << i
    m
  }

  private def maskCol(bank: Seq[String]): Column =
    GraftColumnBridge.column(MultiPatternMask(GraftColumnBridge.expression(col("s")), bank))

  private def runMasks(df: DataFrame, bank: Seq[String]): Seq[Option[Long]] =
    df.select(col("id"), maskCol(bank).as("m")).orderBy("id").collect().toSeq
      .map(r => if (r.isNullAt(1)) None else Some(r.getLong(1)))

  test("MultiPatternMask: codegen and interpreted paths both equal the java.util.regex reference on 6 random banks") {
    for (seed <- 1L to 6L) {
      val rnd  = new scala.util.Random(seed)
      val bank = rnd.shuffle(regexPool).take(1 + rnd.nextInt(regexPool.size))
      val strs = (0 until 40).map(_ => drawMaskStr(rnd))
      val rows = strs.zipWithIndex.map { case (s, i) => Row(i.toLong, s.orNull) }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1 + rnd.nextInt(4)),
        StructType(Seq(StructField("id", LongType), StructField("s", StringType))))
      val expected = strs.map(_.map(maskOf(bank, _)))

      assert(runMasks(df, bank) == expected, s"seed $seed codegen bank ${bank.size}")

      val conf = spark.conf
      val prevWs = conf.get("spark.sql.codegen.wholeStage", "true")
      val prevFm = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
      try {
        conf.set("spark.sql.codegen.wholeStage", "false")
        conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        assert(runMasks(df, bank) == expected, s"seed $seed interpreted bank ${bank.size}")
      } finally {
        conf.set("spark.sql.codegen.wholeStage", prevWs)
        conf.set("spark.sql.codegen.factoryMode", prevFm)
      }
    }
  }

  test("MultiPatternMask: a bank wider than the 64-bit mask is rejected at construction, not silently aliased") {
    val wide = (0 until 65).map(i => s"p$i")
    val ex = intercept[Exception] {
      spark.range(1).select(
        GraftColumnBridge.column(
          MultiPatternMask(GraftColumnBridge.expression(col("id").cast("string")), wide))
      ).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("64"))
  }

  // --- Blocklist -------------------------------------------------------------

  private val phrasePool = Seq("aa", "badword", "bad word", "istanbul", "σιγμα", "xy-z")

  private def drawPiece(rnd: scala.util.Random): String =
    rnd.nextInt(12) match {
      case 0 => "aaaa"            // overlap hazard: "aa" counts twice, not thrice
      case 1 => "BadWord"
      case 2 => "bad word here"
      case 3 => "İstanbul"        // Turkish dotted capital — the pre-fold seam
      case 4 => "ΣΙΓΜΑ"           // capital sigma fold
      case 5 => "xy-z xy-zxy-z"
      case 6 => ""
      case _ => s"tok${rnd.nextInt(20)}"
    }

  private def countNonOverlap(t: String, p: String): Long = {
    var i = 0; var n = 0L
    while ({ i = t.indexOf(p, i); i >= 0 }) { n += 1; i += p.length }
    n
  }

  test("blocklistHits: replace-length identity == in-JVM non-overlapping count under case/unicode folds on 6 random corpora") {
    for (seed <- 11L to 16L) {
      val rnd     = new scala.util.Random(seed)
      val phrases = rnd.shuffle(phrasePool).take(1 + rnd.nextInt(phrasePool.size))
      val docs = (0 until (5 + rnd.nextInt(40))).map { i =>
        (i.toLong, (0 until rnd.nextInt(8)).map(_ => drawPiece(rnd)).mkString(" "))
      }
      import spark.implicits._
      val df  = docs.toDF("doc_id", "text").repartition(1 + rnd.nextInt(4))
      val got = Blocklist.blocklistHits(df, phrases).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      val expected = docs.map { case (id, text) =>
        val folded = TextOps.lowerSimpleJvm(text)
        val hits   = phrases.map(p => countNonOverlap(folded, TextOps.lowerSimpleJvm(p))).sum
        (id, hits, hits > 0L)
      }
      assert(got == expected, s"seed $seed phrases $phrases")
    }
  }

  // --- RRF fusion ------------------------------------------------------------

  private val RrfScale = 1000000000L

  test("rrfHybrid: fused relation == full-outer fusion of the two tiers' own top-k lists on 4 random corpora") {
    val qToks = Seq("alpha", "beta")
    for (seed <- 21L to 24L) {
      val rnd = new scala.util.Random(seed)
      val nDocs = 6 + rnd.nextInt(30)
      val tokenPool = Seq("alpha", "beta", "gamma", "delta", "eps")
      val docs = (0 until nDocs).map { i =>
        (i.toLong, (0 until (1 + rnd.nextInt(12))).map(_ => tokenPool(rnd.nextInt(tokenPool.size))).mkString(" "))
      }
      val nVecs = 4 + rnd.nextInt(20)
      val embs = (0 until nVecs).map { i =>
        (i.toLong, Array.fill(4)(rnd.nextFloat() * 2f - 1f))
      }
      import spark.implicits._
      val docsDF = docs.toDF("doc_id", "text").repartition(2)
      val embDF  = embs.toDF("vec_id", "embedding").repartition(2)
      val k = 3 + rnd.nextInt(6)

      val bmRanks = TextOps.bm25(docsDF, qToks, k).collect().toSeq
        .map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy { case (id, score) => (-score, id) }
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      val annRanks = SimilarityOps.cosineTopK(embDF, Seq(0L), k).collect().toSeq
        .map(r => r.getLong(2) -> r.getLong(1)).toMap

      val expected = (bmRanks.keySet ++ annRanks.keySet).toSeq.map { id =>
        val br = bmRanks.getOrElse(id, 0L)
        val ar = annRanks.getOrElse(id, 0L)
        val rrf = (if (br > 0) RrfScale / (60 + br) else 0L) +
          (if (ar > 0) RrfScale / (60 + ar) else 0L)
        (id, br, ar, rrf)
      }.sortBy { case (id, _, _, rrf) => (-rrf, id) }

      val got = HybridSearch.rrfHybrid(docsDF, embDF, qToks, 0L, k).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got == expected, s"seed $seed k $k nDocs $nDocs nVecs $nVecs")
    }
  }
}
