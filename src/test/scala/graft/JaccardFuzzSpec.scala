package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.DedupOps

/** Differential fuzz of the exact-Jaccard tier — shingle postings, the
  * inverted-index pair join (capped and uncapped), and the duplicated-shingle
  * density rollup — against a naive in-JVM set reference. The randomized
  * hazards: a 3-word alphabet makes shared shingles and high-df "boilerplate"
  * shingles dense (so the df-cap actually bites), double spaces put empty
  * tokens inside shingles, docs at exactly/below the shingle width drop out,
  * and within-doc repeated shingles must collapse (the postings collect_set)
  * before any count.
  */
class JaccardFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  private def round6(v: Double): Double =
    new java.math.BigDecimal(java.lang.Double.toString(v))
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  private def docsDF(texts: Seq[String], parts: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)
    ))
    val rows = texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts), schema)
  }

  /** doc → distinct 3-shingle set (lowercased, split keeps empty tokens). */
  private def refSets(texts: Seq[String]): Map[Long, Set[String]] =
    texts.zipWithIndex.collect {
      case (t, d) if t.replace('İ', 'i').replace('Σ', 'σ').toLowerCase(java.util.Locale.ROOT)
        .split(" ", -1).length >= 3 =>
        val ts = t.replace('İ', 'i').replace('Σ', 'σ')
          .toLowerCase(java.util.Locale.ROOT).split(" ", -1)
        d.toLong -> ts.sliding(3).map(_.mkString(" ")).toSet
    }.toMap

  private def corpus(seed: Long): Seq[String] = {
    val words = Array("aa", "bb", "ΛΟΓΟΣ")
    val rnd   = new scala.util.Random(seed)
    (0 until 4 + rnd.nextInt(20)).map { _ =>
      val sep = if (rnd.nextInt(5) == 0) "  " else " "
      Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.length))).mkString(sep)
    }
  }

  test("jaccard pairs (capped + uncapped) and dup-shingle density == naive set reference on 8 random corpora") {
    val threshold = 0.25
    for (seed <- 1L to 8L) {
      val rnd   = new scala.util.Random(seed * 7)
      val texts = corpus(seed)
      val sets  = refSets(texts)
      val df    = docsDF(texts, 1 + rnd.nextInt(5))
      val postings = DedupOps.shinglePostings(df)

      // shingle → document frequency, from the reference sets
      val dfOf: Map[String, Int] =
        sets.values.flatten.groupBy(identity).map { case (s, xs) => s -> xs.size }

      def refPairs(keep: String => Boolean): Seq[(Long, Long, Double)] = {
        val capped = sets.map { case (d, s) => d -> s.filter(keep) }
        val ids    = capped.keys.toSeq.sorted
        for {
          a <- ids; b <- ids; if a < b
          i = (capped(a) & capped(b)).size; if i > 0
          j = i.toDouble / (capped(a).size + capped(b).size - i); if j >= threshold
        } yield (a, b, j)
      }

      val gotUncapped = DedupOps.jaccardPairsFromPostings(postings, threshold).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(gotUncapped == refPairs(_ => true), s"seed $seed uncapped")

      val cap = 1 + rnd.nextInt(3)
      val gotCapped = DedupOps.jaccardPairsFromPostings(postings, threshold, Some(cap)).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(gotCapped == refPairs(s => dfOf(s) <= cap), s"seed $seed cap $cap")

      val expectedDup = sets.toSeq.sortBy(_._1).map { case (d, s) =>
        val dup = s.count(dfOf(_) > 1).toLong
        (d, s.size.toLong, dup, round6(dup.toDouble / s.size))
      }
      val gotDup = DedupOps.dupShingleStats(postings).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(gotDup == expectedDup, s"seed $seed dup-density")
    }
  }
}
