package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.pattern.PatternRules
import graft.stats.{BottomKSketch, MergeableStats}

/** Differential fuzz of the two mergeable profiling tiers that so far only
  * had fixture specs:
  *
  *   - [[BottomKSketch]] — the deterministic md5-bottom-k quantile sketch —
  *     against an in-JVM reference that draws the SAME k rows (MessageDigest
  *     md5 over the identical `key:salt` rendering, hex ordered as ASCII) and
  *     interpolates with the identical `(n−1)·q` rule. Because the selection
  *     is deterministic-by-construction, the comparison is exact equality,
  *     not an error bound — and it must hold under any partitioning and any
  *     input row order (that reproducibility IS the sketch's contract).
  *
  *   - [[MergeableStats]] — slice-profile-then-merge — against a single
  *     in-JVM full-scan count (java.util.regex `find()` per measured
  *     pattern, the same dialect the bank compiles). The randomized axis is
  *     the SLICING: the same table sliced two different ways must merge to
  *     the same exact counts, which is the incremental-pipeline invariant
  *     ("partition the 100 TB scan any way you like, the merged profile
  *     cannot tell"). HLL distincts are checked within sketch tolerance.
  *
  * Value pools are engineered for the seams: null keys (excluded on both
  * engines), null/empty/unicode values, strings that straddle the pattern
  * banks (emails, 9-to-15-digit runs that flip phone_1, uuid-ish hex), and
  * 1–7 input partitions.
  */
class SketchPartialsFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  private def round6(v: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(v))
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8)).map("%02x".format(_)).mkString

  // --- BottomKSketch ---------------------------------------------------------

  private case class SkRec(k: Option[Long], a: Option[Double], b: Option[Double])

  /** Exact-in-double hazard pool: ties, negatives, mixed magnitudes. */
  private def drawVal(rnd: scala.util.Random): Option[Double] =
    rnd.nextInt(10) match {
      case 0     => None
      case 1 | 2 => Some(rnd.nextInt(4).toDouble)
      case 3     => Some(rnd.nextInt(400) / 4.0 - 50.0)
      case 4     => Some(-1.0e9 + rnd.nextInt(16))
      case 5     => Some(rnd.nextInt(16) * 1.0e-6)
      case _     => Some(rnd.nextInt(1000).toDouble)
    }

  private def skCorpus(seed: Long): Seq[SkRec] = {
    val rnd = new scala.util.Random(seed)
    val n   = Seq(1, 2, 5, 40, 150)(rnd.nextInt(5))
    (0 until n).map { i =>
      // unique non-null keys (the documented contract); ~10% null keys to
      // exercise the shared exclusion
      val key = if (rnd.nextInt(10) == 0) None else Some(i * 7L + rnd.nextInt(3) * 100000L + i)
      SkRec(key, drawVal(rnd), drawVal(rnd))
    }.zipWithIndex.map { case (r, i) => r.copy(k = r.k.map(_ => i.toLong * 13 + 1)) }
  }

  private def skDF(recs: Seq[SkRec], parts: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = true),
      StructField("a", DoubleType, nullable = true),
      StructField("b", DoubleType, nullable = true)
    ))
    val rows = recs.map(r =>
      Row(r.k.map(Long.box).orNull, r.a.map(Double.box).orNull, r.b.map(Double.box).orNull))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts), schema)
  }

  /** The reference: same hash string, same hex order, same interpolation. */
  private def refSketch(
      recs: Seq[SkRec], k: Int, qs: Seq[Double], salt: String): Seq[(String, Double, Option[Double])] = {
    val sample = recs
      .filter(_.k.isDefined)
      .sortBy(r => md5hex(s"${r.k.get}:$salt"))
      .take(k)
    (for (c <- Seq("a", "b")) yield {
      val values = sample.flatMap(r => if (c == "a") r.a else r.b).toArray.sorted
      qs.map { q =>
        val est =
          if (values.isEmpty) None
          else {
            val x  = (values.length - 1) * q
            val lo = values(math.floor(x).toInt)
            val hi = values(math.ceil(x).toInt)
            Some(round6(lo + (hi - lo) * (x - math.floor(x))))
          }
        (c, q, est)
      }
    }).flatten
  }

  test("sketchQuantiles: md5-bottom-k selection + interpolation == in-JVM reference on 8 random multisets") {
    val qs = Seq(0.0, 0.25, 0.5, 0.613, 0.9, 1.0)
    for (seed <- 1L to 8L) {
      val recs  = skCorpus(seed)
      val rnd   = new scala.util.Random(seed * 31)
      val parts = 1 + rnd.nextInt(7)
      val k     = Seq(1, 3, 16, recs.size * 2 + 1)(rnd.nextInt(4))
      val salt  = s"fz$seed"
      val got = BottomKSketch.sketchQuantiles(skDF(recs, parts), Seq("k"), Seq("a", "b"), qs, k, salt)
        .collect().toSeq
        .map(r => (r.getString(0), r.getDouble(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      val expected = refSketch(recs, k, qs, salt).sortBy(t => (t._1, t._2))
      assert(got == expected, s"seed $seed k $k parts $parts n ${recs.size}")
    }
  }

  test("sketchQuantiles: estimates are invariant under partitioning and row order (the reproducibility contract)") {
    val qs   = Seq(0.1, 0.5, 0.75)
    val recs = skCorpus(42L)
    val base = BottomKSketch.sketchQuantiles(skDF(recs, 3), Seq("k"), Seq("a", "b"), qs, 8, "inv").collect().toSeq
    for ((variant, parts) <- Seq(recs.reverse -> 1, new scala.util.Random(7L).shuffle(recs) -> 7)) {
      val got = BottomKSketch.sketchQuantiles(skDF(variant, parts), Seq("k"), Seq("a", "b"), qs, 8, "inv")
        .collect().toSeq
      assert(got == base, s"parts $parts")
    }
  }

  // --- MergeableStats --------------------------------------------------------

  private case class MsRec(s1: Option[String], s2: Option[String], m: Option[String], p: Option[String], w: Option[String])

  /** Strings that straddle the measured banks: emails (valid and near-miss),
    * digit runs either side of phone_1's 9..15 window, uuid-ish hex, plain
    * words, empty string, simple unicode.
    */
  private def drawStr(rnd: scala.util.Random): Option[String] =
    rnd.nextInt(12) match {
      case 0      => None
      case 1      => Some("")
      case 2      => Some(s"u${rnd.nextInt(40)}@ex${rnd.nextInt(4)}.com")
      case 3      => Some(s"u${rnd.nextInt(40)}@nodot")
      case 4      => Some("1" * (8 + rnd.nextInt(9))) // 8..16 digits
      case 5      => Some(f"${rnd.nextInt(1000)}%03d-${rnd.nextInt(100)}%02d-${rnd.nextInt(10000)}%04d")
      case 6      => Some("deadbeef-dead-beef-dead-beef00000075")
      case 7      => Some(s"word${rnd.nextInt(6)}")
      case 8      => Some("Σφινξ İstanbul")
      case 9      => Some(s"${rnd.nextInt(100)}.${rnd.nextInt(100)}.${rnd.nextInt(100)}.${rnd.nextInt(100)}")
      case _      => Some(s"txt ${rnd.nextInt(20)}")
    }

  private def msCorpus(seed: Long): Seq[MsRec] = {
    val rnd = new scala.util.Random(seed)
    val n   = 20 + rnd.nextInt(120)
    (0 until n).map { _ =>
      MsRec(
        if (rnd.nextInt(15) == 0) None else Some(s"s${rnd.nextInt(4)}"),
        if (rnd.nextInt(15) == 0) None else Some(s"d${rnd.nextInt(3)}"),
        drawStr(rnd), drawStr(rnd), drawStr(rnd))
    }
  }

  private def msDF(recs: Seq[MsRec], parts: Int): DataFrame = {
    val schema = StructType(
      Seq("s1", "s2", "m", "p", "w").map(n => StructField(n, StringType, nullable = true)))
    val rows = recs.map(r => Row(r.s1.orNull, r.s2.orNull, r.m.orNull, r.p.orNull, r.w.orNull))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts), schema)
  }

  private def field(r: MsRec, c: String): Option[String] = c match {
    case "s1" => r.s1; case "s2" => r.s2; case "m" => r.m; case "p" => r.p; case _ => r.w
  }

  /** One in-JVM full scan: the same counts the merged partials must produce. */
  private def refCounts(recs: Seq[MsRec], dataCols: Seq[String]): Map[String, (Long, Long, Map[String, Long])] = {
    val compiled = PatternRules.measuredPatterns.map(p => p.key -> java.util.regex.Pattern.compile(p.regex))
    dataCols.map { c =>
      val vals = recs.map(field(_, c))
      val nn   = vals.count(_.isDefined).toLong
      val hits = compiled.map { case (key, pat) =>
        key -> vals.count(v => v.exists(s => pat.matcher(s).find())).toLong
      }.toMap
      c -> ((recs.size.toLong, nn, hits))
    }.toMap
  }

  test("mergedStatsDF: slice-profile-then-merge == in-JVM full-scan counts, for TWO different slicings of the same table") {
    for (seed <- 101L to 104L) {
      val recs  = msCorpus(seed)
      val parts = 1 + new scala.util.Random(seed).nextInt(7)
      val df    = msDF(recs, parts)
      for (sliceCol <- Seq("s1", "s2")) {
        val dataCols = Seq("s1", "s2", "m", "p", "w").filter(_ != sliceCol)
        val expected = refCounts(recs, dataCols)
        val got      = MergeableStats.mergedStatsDF(df, sliceCol).collect()
        assert(got.map(_.getString(0)).toSeq == dataCols.sorted, s"seed $seed slice $sliceCol columns")
        for (r <- got) {
          val (total, nn, hits) = expected(r.getString(0))
          assert(r.getLong(1) == total, s"seed $seed slice $sliceCol ${r.getString(0)} total")
          assert(r.getLong(2) == nn, s"seed $seed slice $sliceCol ${r.getString(0)} nn")
          for ((p, k) <- PatternRules.measuredPatterns.map(_.key).zipWithIndex)
            assert(r.getLong(3 + k) == hits(p), s"seed $seed slice $sliceCol ${r.getString(0)} m_$p")
        }
      }
    }
  }

  test("merge: HLL distincts stay within sketch tolerance of the exact distinct under random slicing") {
    val recs = msCorpus(999L)
    val df   = msDF(recs, 5)
    val cols = Seq("s2", "m", "p", "w")
    val merged = MergeableStats.merge(MergeableStats.partials(df, "s1"), cols)
    for (s <- merged) {
      val exact = recs.flatMap(field(_, s.name)).distinct.size.toLong
      val tol   = math.max(2L, (exact * 0.05).toLong)
      assert(math.abs(s.uniqueCount - exact) <= tol,
        s"${s.name}: HLL ${s.uniqueCount} vs exact $exact")
    }
  }
}
