package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Sessionize, StreamingDedup}

/** Differential fuzz of the stateful streaming twins against their batch
  * operators, randomizing the axis the fixed parity tests cannot: WHERE the
  * micro-batch boundaries fall. A session island or dedup fingerprint that
  * survives one hand-picked batch split can still break on another — state
  * carried across arbitrary boundaries (straggler islands, bridge events
  * that merge two open islands, fingerprints first seen mid-duplicate-run)
  * is exactly what these operators claim to get right.
  *
  * Sessionization additionally fuzzes watermark-bounded DISORDER: events
  * within the watermark delay of their slice's maximum may arrive one batch
  * late (the documented contract — `sessionStateFn` buffers stragglers as
  * islands until their gap horizon passes). Events are never moved beyond
  * the delay, so nothing is watermark-dropped and batch parity must be
  * EXACT.
  */
class StreamingBatchFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val BaseSec = java.time.Instant.parse("2024-01-01T09:00:00Z").getEpochSecond

  private def tsOf(sec: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))

  /** Cut a time-sorted event list into contiguous slices, then move a few
    * events within `maxLateSec` of their slice's max one batch later —
    * disorder the watermark (delay ≥ maxLateSec) is contractually bound to
    * absorb.
    */
  private def slicesWithDisorder[T](
      sorted: Seq[T],
      secOf: T => Long,
      nBatches: Int,
      maxLateSec: Long,
      rnd: scala.util.Random
  ): Seq[Seq[T]] = {
    val cuts = Seq.fill(nBatches - 1)(rnd.nextInt(sorted.size + 1)).sorted
    val bounds  = (0 +: cuts :+ sorted.size).sliding(2).toSeq
    val slices0 = bounds.map { case Seq(a, b) => sorted.slice(a, b) }
    var carry = Seq.empty[T]
    slices0.zipWithIndex.map { case (s, i) =>
      val all = carry ++ s
      carry = Seq.empty
      if (i == slices0.size - 1 || all.isEmpty) all
      else {
        val maxSec = all.map(secOf).max
        val (late, onTime) =
          all.partition(e => secOf(e) > maxSec - maxLateSec && rnd.nextInt(3) == 0 && all.size > 1)
        // never delay the whole slice (an empty arrival would stall the watermark)
        if (onTime.isEmpty) all else { carry = late; onTime }
      }
    } ++ (if (carry.nonEmpty) Seq(carry) else Nil)
  }

  test("streamingSessions == batchSessions under random micro-batch splits and bounded disorder") {
    val gapSeconds = 600L
    for (seed <- 1L to 4L) {
      val rnd = new scala.util.Random(seed)
      val evs = (0 until 30 + rnd.nextInt(50)).map { i =>
        // 5-minute grid over 3 hours: gap boundaries (exactly 600 s, just
        // over) and same-second ties all occur
        val sec = BaseSec + rnd.nextInt(36) * 300L
        (tsOf(sec), rnd.nextInt(4).toLong, i.toLong)
      }
      val sorted = evs.sortBy(e => (e._1.getTime, e._3))
      val slices = slicesWithDisorder[(java.sql.Timestamp, Long, Long)](
        sorted, _._1.getTime / 1000L, 1 + rnd.nextInt(5), maxLateSec = 240L, rnd)

      implicit val sq = spark.sqlContext
      val input  = MemoryStream[(java.sql.Timestamp, Long, Long)]
      val stream = input.toDF().toDF("ts", "user_id", "event_id").withWatermark("ts", "5 minutes")
      val name   = s"graft_fuzz_sessions_$seed"
      val q = Sessionize.streamingSessions(stream, gapSeconds)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        for (s <- slices; if s.nonEmpty) {
          input.addData(rnd.shuffle(s): _*) // intra-batch order is free
          q.processAllAvailable()
        }
        input.addData((tsOf(BaseSec + 86400L), 999L, 999999L)) // flush: watermark passes every horizon
        q.processAllAvailable()
        val streamed = spark.table(name).as[Sessionize.ClosedSession].collect()
          .filter(_.userId != 999L)
          .map(s => (s.userId, s.sessionStart, s.sessionEnd, s.nEvents)).toSet
        val batchDf = evs
          .map { case (t, u, e) => (t, u, e, "x", 0.0, "{}") }
          .toDF("ts", "user_id", "event_id", "event_type", "value", "props")
        val batch = Sessionize.batchSessions(batchDf, gapSeconds).collect()
          .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_start"),
            r.getAs[Long]("session_end"), r.getAs[Long]("n_events"))).toSet
        assert(streamed == batch, s"seed $seed slices ${slices.map(_.size).mkString("/")}")
      } finally {
        q.stop()
        spark.sql(s"DROP VIEW IF EXISTS $name")
      }
    }
  }

  test("streaming firstSeen == batch exactDuplicates survivors under random batch splits") {
    val words = Array("alpha", "beta", "gamma", "delta")
    for (seed <- 11L to 14L) {
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 20 + rnd.nextInt(40)).map { i =>
        // tiny phrase space + whitespace/case variants: many cross-batch
        // duplicate runs that normalize to the same fingerprint
        val phrase = Seq.fill(1 + rnd.nextInt(3))(words(rnd.nextInt(words.length)))
          .mkString(if (rnd.nextInt(4) == 0) "  " else " ")
        (i.toLong, if (rnd.nextInt(5) == 0) phrase.toUpperCase(java.util.Locale.ROOT) else phrase)
      }
      // doc_id-monotone batches: the declared parity precondition (within a
      // batch, ties break to min doc_id; across batches, first batch wins)
      val nBatches = 1 + rnd.nextInt(5)
      val cuts     = Seq.fill(nBatches - 1)(rnd.nextInt(docs.size + 1)).sorted
      val slices   = (0 +: cuts :+ docs.size).sliding(2).map { case Seq(a, b) => docs.slice(a, b) }.toSeq

      implicit val sq = spark.sqlContext
      val input = MemoryStream[(Long, String)]
      val name  = s"graft_fuzz_firstseen_$seed"
      val q = StreamingDedup.firstSeen(input.toDF().toDF("doc_id", "text"))
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        for (s <- slices; if s.nonEmpty) {
          input.addData(rnd.shuffle(s): _*)
          q.processAllAvailable()
        }
        val streamed = spark.table(name).as[StreamingDedup.FirstSeen].collect()
          .map(f => (f.fp, f.docId)).toSet
        val batch = graft.dedup.DedupOps.exactDuplicates(
          docs.toDF("doc_id", "text")).collect()
          .map(r => (r.getString(0), r.getLong(1))).toSet
        assert(streamed == batch, s"seed $seed slices ${slices.map(_.size).mkString("/")}")
      } finally {
        q.stop()
        spark.sql(s"DROP VIEW IF EXISTS $name")
      }
    }
  }
}
