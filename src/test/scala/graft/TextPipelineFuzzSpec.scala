package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{ApproxVocab, Packing, SpanDedup, TextOps}

/** Differential fuzz of the text-pipeline operators whose distributed
  * formulations hide sequential semantics: ExactSubstr span dedup (cut
  * positions must union across overlapping duplicated spans), greedy
  * next-fit packing (the per-partition recurrence), and the Misra-Gries /
  * Count-Min vocabulary path (whose guarantees — candidate superset and
  * one-sided estimates — must hold on ANY corpus, not just the friendly
  * one). References are direct in-JVM implementations of the declared
  * semantics; corpora are drawn from tiny alphabets so duplicated spans,
  * token ties and bucket collisions are dense rather than accidental, and
  * include İ (the unconditional special-lowercase mapping) and word-final Σ
  * (the conditional Final_Sigma mapping), empty texts
  * and leading/trailing-space empty tokens.
  */
class TextPipelineFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  private def lowerRef(s: String): String =
    s.replace('İ', 'i').replace('Σ', 'σ').toLowerCase(java.util.Locale.ROOT)

  private def docsDF(texts: Seq[String], parts: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)
    ))
    val rows = texts.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts), schema)
  }

  // --- span dedup ------------------------------------------------------------

  private def refSpanDedup(texts: Seq[String], k: Int): Seq[(Long, Long, Long, String)] = {
    val toks: Seq[Array[String]] = texts.map(t => lowerRef(t).split(" ", -1))
    // global first occurrence per duplicated k-token span (doc_id·10⁶+pos min)
    val occ = scala.collection.mutable.HashMap.empty[String, List[(Long, Long)]]
    for ((ts, d) <- toks.zipWithIndex; if ts.length >= k; pos <- 0 to ts.length - k) {
      val s = ts.slice(pos, pos + k).mkString(" ")
      occ.update(s, (d.toLong, pos.toLong) :: occ.getOrElse(s, Nil))
    }
    val covered = scala.collection.mutable.HashSet.empty[(Long, Long)]
    for ((_, os) <- occ; if os.size > 1) {
      val keep = os.map { case (d, p) => d * 1000000L + p }.min
      for ((d, p) <- os; if d * 1000000L + p != keep; i <- 0 until k)
        covered.add((d, p + i))
    }
    toks.zipWithIndex.map { case (ts, d) =>
      val kept = ts.zipWithIndex.collect {
        case (t, p) if !covered((d.toLong, p.toLong)) => t
      }
      (d.toLong, ts.length.toLong, kept.length.toLong, kept.mkString(" "))
    }
  }

  test("spanDedup: cut-then-stitch == naive reference on 8 random corpora (k=2,3)") {
    val words = Array("aa", "bb", "cc", "dd", "İq", "ΘΕΟΣ")
    for (seed <- 1L to 8L) {
      val rnd = new scala.util.Random(seed)
      val k   = 2 + (seed % 2).toInt
      val texts = (0 until 1 + rnd.nextInt(25)).map { _ =>
        rnd.nextInt(12) match {
          case 0 => "" // one-empty-token doc (split of "" is [""])
          case 1 => " " + Seq.fill(1 + rnd.nextInt(4))(words(rnd.nextInt(words.length))).mkString(" ")
          case _ => Seq.fill(rnd.nextInt(20))(words(rnd.nextInt(words.length))).mkString(" ")
        }
      }
      val expected = refSpanDedup(texts, k)
      val got = SpanDedup.spanDedup(docsDF(texts, 1 + rnd.nextInt(5)), k).collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      assert(got == expected, s"seed $seed k $k docs ${texts.size}")
    }
  }

  // --- packing ---------------------------------------------------------------

  /** The sequential next-fit recurrence over one ordered doc stream. */
  private def refGreedy(stream: Seq[(Long, Long)], budget: Long): Seq[(Long, Long, Long, Int)] = {
    var packSeq = 0L; var used = 0L; var pos = 0; var started = false
    stream.map { case (docId, n) =>
      if (!started || used + n > budget) {
        if (started) packSeq += 1
        used = 0L; pos = 0; started = true
      }
      used += n
      val out = (packSeq, docId, n, pos)
      pos += 1
      out
    }
  }

  test("packSequences: every partition's packing replays the next-fit recurrence (8 random corpora)") {
    for (seed <- 11L to 18L) {
      val rnd    = new scala.util.Random(seed)
      val budget = 8L + rnd.nextInt(24)
      val texts = (0 until 1 + rnd.nextInt(50)).map { _ =>
        // 0-token, packable, boundary-exact and over-budget docs all occur
        val n = rnd.nextInt((budget * 2).toInt + 1)
        Seq.fill(n)("tok").mkString(" ")
      }
      val parts  = 1 + rnd.nextInt(6)
      val packed = Packing.packSequences(docsDF(texts, parts), budget).collect().toSeq
      // exactly-once: every doc packed once, with its true whitespace count
      assert(packed.map(_.docId).sorted == texts.indices.map(_.toLong),
        s"seed $seed: docs lost or duplicated")
      val nTok = texts.map(t => if (t.isEmpty) 0L else t.split(" ", -1).count(_.nonEmpty).toLong)
      packed.foreach(p => assert(p.nTokens == nTok(p.docId.toInt), s"seed $seed doc ${p.docId}"))
      // replay: within each partition (packId >> 32) the greedy core must
      // reproduce the recurrence over that partition's doc_id-sorted stream
      packed.groupBy(_.packId >> 32).foreach { case (pid, ps) =>
        val stream   = ps.sortBy(_.docId).map(p => (p.docId, p.nTokens))
        val expected = refGreedy(stream, budget).map { case (seq, d, n, pos) =>
          (pid << 32 | seq, d, n, pos)
        }
        val got = ps.sortBy(_.docId).map(p => (p.packId, p.docId, p.nTokens, p.seqPos))
        assert(got == expected, s"seed $seed pid $pid")
      }
    }
  }

  test("packDeterministic: pinned twin == global next-fit reference (8 random corpora)") {
    for (seed <- 21L to 28L) {
      val rnd    = new scala.util.Random(seed)
      val budget = 6L + rnd.nextInt(20)
      val texts = (0 until 1 + rnd.nextInt(40)).map { _ =>
        Seq.fill(rnd.nextInt((budget * 2).toInt))("tok").mkString(" ")
      }
      val nTok = texts.map(t => if (t.isEmpty) 0L else t.split(" ", -1).count(_.nonEmpty).toLong)
      val expected = refGreedy(texts.indices.map(i => (i.toLong, nTok(i))), budget)
        .map { case (seq, d, n, pos) => (d, n, seq, pos.toLong) }
        .sortBy(_._1)
      val got = Packing.packDeterministic(docsDF(texts, 1 + rnd.nextInt(5)), budget)
        .collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got == expected, s"seed $seed docs ${texts.size}")
    }
  }

  // --- approximate vocabulary --------------------------------------------------

  private def refCounts(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(t => lowerRef(t).split(" ", -1)).filter(_.nonEmpty)
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }

  test("approxTopTokens: one-sided estimates and ranked shape on 6 random corpora") {
    val words = Array("a", "b", "c", "d", "e", "f", "g", "h")
    for (seed <- 31L to 36L) {
      val rnd = new scala.util.Random(seed)
      val texts = (0 until 5 + rnd.nextInt(30)).map { _ =>
        // Zipf-ish: low-index words drawn far more often
        Seq.fill(1 + rnd.nextInt(30))(words(math.min(rnd.nextInt(words.length), rnd.nextInt(words.length))))
          .mkString(" ")
      }
      val exact = refCounts(texts)
      val k     = 5
      val got = ApproxVocab.approxTopTokens(docsDF(texts, 1 + rnd.nextInt(4)), k = k,
        counterBudget = words.length + 1).collect().toSeq
        .map(r => (r.getString(0), r.getLong(1)))
      assert(got.size == math.min(k, exact.size), s"seed $seed")
      // Count-Min never under-counts
      got.foreach { case (t, est) => assert(est >= exact(t), s"seed $seed token $t") }
      // declared ranking: estimate desc, token asc
      assert(got == got.sortBy { case (t, n) => (-n, t) }, s"seed $seed")
    }
  }

  test("mgTopTokensPinned: exact top-K whenever the budget holds the vocabulary (6 random corpora)") {
    val words = Array("x", "y", "z", "w", "v")
    for (seed <- 41L to 46L) {
      val rnd = new scala.util.Random(seed)
      val texts = (0 until 3 + rnd.nextInt(20)).map { _ =>
        Seq.fill(1 + rnd.nextInt(25))(words(math.min(rnd.nextInt(words.length), rnd.nextInt(words.length))))
          .mkString(" ")
      }
      val k = 4
      val expected = refCounts(texts).toSeq.sortBy { case (t, n) => (-n, t) }.take(k)
      val got = ApproxVocab.mgTopTokensPinned(docsDF(texts, 1 + rnd.nextInt(4)), k = k,
        counterBudget = words.length).collect().toSeq
        .map(r => (r.getString(0), r.getLong(1)))
      assert(got == expected, s"seed $seed")
    }
  }
}
