package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.DedupOps

/** Differential fuzz of the LSH banding PLUMBING — the stack/groupBy/explode
  * pipeline that turns per-row signatures into candidate pairs. The kernels
  * themselves are bit-identity-fuzzed in PropertySpec; HERE the reference
  * recomputes signatures from the published constants (md5-prefix hash,
  * affine (a·x+b) mod p, band layout) and derives pairs by direct bucketing
  * (minhash) or by brute-force hamming scan (simhash — the pigeonhole
  * completeness claim: banding must find EVERY pair within the radius, so
  * the reference gets to ignore banding entirely). Corpora are near-dup
  * dense by construction (mutated copies), keep empty tokens (double
  * spaces — the signature tokenizer does NOT filter them), and carry İ/Σ
  * words so the simple-casefold applies inside signatures too.
  */
class LshFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  // --- reference kernel (independent reimplementation from the constants) ---

  private def hash32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** minhashSignatures tokenization: split on single space, EMPTY TOKENS
    * KEPT, simple casefold; docs under ShingleSize tokens drop out.
    */
  private def sigToks(text: String): Array[String] =
    graft.text.TextOps.lowerSimpleJvm(text).split(" ", -1)

  private def minhashSig(toks: Array[String]): Option[Array[Long]] =
    if (toks.length < DedupOps.ShingleSize) None
    else {
      val sig = Array.fill(DedupOps.NumHashes)(Long.MaxValue)
      for (i <- 0 to toks.length - DedupOps.ShingleSize) {
        val x = hash32(toks.slice(i, i + DedupOps.ShingleSize).mkString(" "))
        for (k <- 0 until DedupOps.NumHashes) {
          val (a, b) = DedupOps.hashCoeffs(k)
          val h      = (a * x + b) % DedupOps.HashPrime
          if (h < sig(k)) sig(k) = h
        }
      }
      Some(sig)
    }

  /** simhash tokenization: empty tokens FILTERED, empty docs drop out. */
  private def simhashRef(text: String): Option[Long] = {
    val toks = graft.text.TextOps.lowerSimpleJvm(text).split(" ", -1).filter(_.nonEmpty)
    if (toks.isEmpty) None
    else {
      val counts = new Array[Int](32)
      toks.foreach { t =>
        val x = hash32(t)
        for (j <- 0 until 32) if (((x >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
      }
      Some((0 until 32).foldLeft(0L)((h, j) => if (counts(j) > 0) h | (1L << j) else h))
    }
  }

  // --- corpora ---------------------------------------------------------------

  private val words =
    Array("aa", "bb", "cc", "dd", "ee", "İq", "ΘΕΟΣ", "zz")

  /** Near-dup dense: a few base docs, many mutated/duplicated copies, some
    * short (<3 tokens) and empty-token (double space) docs.
    */
  private def corpus(seed: Long): Seq[(Long, String)] = {
    val rnd   = new scala.util.Random(seed)
    val bases = (0 until 3 + rnd.nextInt(3)).map { _ =>
      Seq.fill(6 + rnd.nextInt(10))(words(rnd.nextInt(words.length)))
    }
    val n = 12 + rnd.nextInt(24)
    (0 until n).map { i =>
      val text = rnd.nextInt(10) match {
        case 0 => Seq.fill(rnd.nextInt(3))(words(rnd.nextInt(words.length))).mkString(" ")
        case 1 => bases(rnd.nextInt(bases.size)).mkString("  ") // empty tokens inside
        case 2 | 3 =>
          val b = bases(rnd.nextInt(bases.size)).toArray
          b(rnd.nextInt(b.length)) = words(rnd.nextInt(words.length)) // one-token mutation
          b.mkString(" ")
        case _ => bases(rnd.nextInt(bases.size)).mkString(" ") // exact copy
      }
      (i.toLong, text)
    }
  }

  private def toDF(docs: Seq[(Long, String)], parts: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)
    ))
    spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map { case (id, t) => Row(id, t) }, parts), schema)
  }

  private def refMinhashPairs(docs: Seq[(Long, String)]): Seq[(Long, Long)] = {
    val sigs = docs.flatMap { case (id, t) => minhashSig(sigToks(t)).map(id -> _) }
    val buckets = sigs.flatMap { case (id, sig) =>
      (0 until DedupOps.NumBands).map { j =>
        val key = sig.slice(j * DedupOps.BandRows, (j + 1) * DedupOps.BandRows).mkString(":")
        (j, key) -> id
      }
    }
    buckets.groupBy(_._1).values.toSeq
      .flatMap { members =>
        val ids = members.map(_._2).sorted
        for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
      }
      .distinct.sorted
  }

  test("minhashCandidatePairs: banded bucket pairs == reference banding on 8 random corpora") {
    for (seed <- 1L to 8L) {
      val docs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 31).nextInt(5)
      val expected = refMinhashPairs(docs)
      val got = DedupOps.minhashCandidatePairs(toDF(docs, parts)).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got == expected, s"seed $seed n ${docs.size}")
    }
  }

  test("incrementalMinhashPairs: previous ∪ incremental == full batch on random splits") {
    for (seed <- 11L to 16L) {
      val docs    = corpus(seed)
      val rnd     = new scala.util.Random(seed * 37)
      val parts   = 1 + rnd.nextInt(5)
      val cut     = docs.map(_._1).toSet.filter(_ => rnd.nextBoolean())
      val history = docs.filter(d => cut(d._1))
      val fresh   = docs.filterNot(d => cut(d._1))
      val full    = refMinhashPairs(docs).toSet
      val prev = DedupOps.minhashCandidatePairs(toDF(history, parts)).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val incr = DedupOps.incrementalMinhashPairs(
        DedupOps.minhashSignatures(toDF(history, parts)),
        DedupOps.minhashSignatures(toDF(fresh, parts))).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(prev.subsetOf(full) && incr.subsetOf(full), s"seed $seed: phantom pair")
      assert((prev union incr) == full, s"seed $seed: union != full batch")
      // every incremental pair touches the new slice — no history re-finds
      incr.foreach { case (a, b) =>
        assert(!cut(a) || !cut(b), s"seed $seed: ($a,$b) is history-vs-history")
      }
    }
  }

  test("simhashPairs: banding is COMPLETE — equals brute-force hamming at radius 3 and 5") {
    for (seed <- 21L to 26L; maxHamming <- Seq(3, 5)) {
      val docs  = corpus(seed)
      val parts = 1 + new scala.util.Random(seed * 41).nextInt(5)
      val sigs  = docs.flatMap { case (id, t) => simhashRef(t).map(id -> _) }.sortBy(_._1)
      val expected = (for {
        i <- sigs.indices; j <- i + 1 until sigs.size
        h = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
        if h <= maxHamming
      } yield (sigs(i)._1, sigs(j)._1, h.toLong)).sorted
      val got = DedupOps.simhashPairs(toDF(docs, parts), maxHamming).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got == expected, s"seed $seed maxHamming $maxHamming n ${docs.size}")
    }
  }
}
