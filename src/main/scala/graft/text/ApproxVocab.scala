package graft.text

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Bounded-memory approximate heavy hitters — the 100 TB path for
  * vocabulary discovery. The exact [[TextOps.topTokens]] aggregate carries
  * |vocabulary| state (fine for word-vocabularies, fatal for n-gram or URL
  * vocabularies at corpus scale); this variant bounds BOTH sides of the
  * problem:
  *
  *  - '''counts''' come from a Count-Min sketch (Spark's built-in mergeable
  *    `org.apache.spark.util.sketch.CountMinSketch` via
  *    `df.stat.countMinSketch`) — fixed width×depth memory, one-sided
  *    (over-)estimates, and `mergeInPlace` composes per-slice sketches
  *    exactly like [[graft.stats.MergeableStats]] composes profiles;
  *  - '''candidates''' come from per-partition Misra-Gries summaries
  *    (`counterBudget` counters per partition, the classic frequent-items
  *    guarantee: any token with local frequency > |partition|/budget
  *    survives), unioned across partitions. Tokens with local relative
  *    frequency above 1/(budget+1) in SOME partition are guaranteed
  *    candidates; a global top-K token whose rate is everywhere below that
  *    bound can still be missed — size `counterBudget` against the target
  *    vocabulary's tail, not against K.
  *
  * Final answer: candidates ranked by sketch estimate (desc, token
  * tie-break). Approximate by construction — the spec asserts it recovers
  * the exact top-K on the test corpus, not equality in general.
  */
object ApproxVocab {

  /** Misra-Gries frequent-items summary of one partition's token stream,
    * counters included. `onOverflow` fires before each decrement-all step —
    * i.e. exactly when the summary stops being exact counts.
    */
  private def misraGries(
      it: Iterator[String],
      budget: Int,
      onOverflow: () => Unit = () => ()
  ): Iterator[(String, Long)] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    for (t <- it) {
      if (counters.contains(t)) counters(t) += 1
      else if (counters.size < budget) counters(t) = 1
      else {
        onOverflow()
        // decrement-all step; drop zeroed counters
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        for ((k, v) <- counters) {
          if (v == 1) dead += k else counters(k) = v - 1
        }
        dead.foreach(counters.remove)
      }
    }
    counters.iterator
  }

  def approxTopTokens(
      docs: DataFrame,
      k: Int = 50,
      eps: Double = 1e-4,
      confidence: Double = 0.99,
      counterBudget: Int = 4096
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // scanned twice (sketch + candidates) but deliberately NOT cached: the
    // exploded token stream is the one thing this operator must never
    // materialize (bounded memory is its whole point); the projection is
    // trivially recomputable from the scan
    val toks = graft.Tables.widen(docs)
      .select(explode(split(TextOps.lowerSimple(col("text")), " ")).as("token"))
      .where(col("token") =!= "")
    val cms = toks.stat.countMinSketch("token", eps, confidence, 42)
    val candidates = toks
      .select("token")
      .as[String]
      .mapPartitions(it => misraGries(it, counterBudget).map(_._1))
      .distinct()
      .collect() // bounded: ≤ budget × partitions candidate tokens
    candidates.toSeq
      .map(t => (t, cms.estimateCount(t)))
      .sortBy { case (t, n) => (-n, t) }
      .take(k)
      .toDF("token", "n_est")
  }

  /** The DECLARED partition-pinned twin: one pinned partition and a counter
    * budget sized at or above the vocabulary make Misra-Gries EXACT — the
    * decrement-all step never fires, so every counter is a true count and the
    * ranked top-K hash-checks against the exact-SQL ground truth
    * ([[TextOps.oracleTopTokens]]). The exactness claim is ENFORCED, not
    * hoped for: if the stream ever overflows the budget the query fails
    * loudly rather than silently degrading to approximate counts under an
    * exact oracle. (The approximate multi-partition [[approxTopTokens]]
    * stays the 100 TB route; this twin exists so the MG machinery itself
    * sits under the hash gate — same trick as the deterministic
    * [[Packing.packDeterministic]].)
    */
  def mgTopTokensPinned(docs: DataFrame, k: Int = 50, counterBudget: Int = 4096): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(explode(split(TextOps.lowerSimple(col("text")), " ")).as("token"))
      .where(col("token") =!= "")
      .as[String]
      .repartition(1)
      .mapPartitions { it =>
        misraGries(
          it,
          counterBudget,
          onOverflow = () =>
            throw new IllegalStateException(
              s"vocabulary exceeds counterBudget=$counterBudget — pinned Misra-Gries is only declared where it is exact")
        )
      }
      .toDF("token", "n")
      .orderBy(col("n").desc, col("token"))
      .limit(k)
  }

  /** Merge per-slice sketches — the incremental-vocabulary shape: each daily
    * slice contributes (sketch, candidates); the union of candidates ranked
    * by the merged sketch is the running corpus vocabulary without any
    * re-scan of history. PURE: neither input is mutated (Spark's
    * `mergeInPlace` mutates its receiver, which would silently double-count
    * a slice reused across merges — the receiver here is a serialized copy).
    */
  def mergeSketches(
      a: org.apache.spark.util.sketch.CountMinSketch,
      b: org.apache.spark.util.sketch.CountMinSketch
  ): org.apache.spark.util.sketch.CountMinSketch = {
    val buf = new java.io.ByteArrayOutputStream()
    a.writeTo(buf)
    val copy = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(buf.toByteArray))
    copy.mergeInPlace(b)
  }

  /** Row-level accessor used by specs: exact counts for the same tokens. */
  def exactCounts(docs: DataFrame): Map[String, Long] =
    TextOps.topTokens(docs, Int.MaxValue).collect()
      .map((r: Row) => r.getString(0) -> r.getLong(1)).toMap
}
