package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.scale.{Partitioning, ZOrder}

/** Differential fuzz of the scale-layer operators against in-JVM
  * references: the Morton interleave and its cell histogram (exact bit
  * arithmetic incl. pmod of negative keys), the deterministic-salt
  * aggregation/join twins (identical answers to the unsalted forms under
  * skew, null keys and duplicate dimension keys), the key-skew diagnostic
  * (top-K tie-break pinned to n DESC, key ASC NULLS LAST — the DuckDB twin's
  * default — with forced count ties across the K boundary), the join-size
  * estimator (the histogram identity Σ cₗ·cᵣ with null keys counted in the
  * row totals but never in the join), and the NDV encoding advisory
  * (distinct counts EXCLUDE nulls; an empty input yields NULL ratio and
  * 'plain').
  */
class ScaleOpsFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Reference Morton interleave: bit i of x → 2i, bit i of y → 2i+1. */
  private def morton(x: Long, y: Long, bits: Int): Long = {
    var acc = 0L
    var i   = 0
    while (i < bits) {
      acc |= ((x >> i) & 1L) << (2 * i)
      acc |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    acc
  }

  private def pmod(v: Long, m: Long): Long = ((v % m) + m) % m

  private def xyDF(rows: Seq[(Long, Long)], parts: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("x", LongType, nullable = false),
      StructField("y", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (x, y) => Row(x, y) }, parts), schema)
  }

  // --- z-order ---------------------------------------------------------------

  test("zValue == Morton reference on random bounded grids") {
    for (seed <- 1L to 6L) {
      val rnd  = new scala.util.Random(seed)
      val bits = 2 + rnd.nextInt(14) // 2..15
      val m    = 1L << bits
      val rows = Seq.fill(40 + rnd.nextInt(60))((rnd.nextLong(m), rnd.nextLong(m)))
      val got = xyDF(rows, 1 + rnd.nextInt(4))
        .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y"), bits).as("z"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
      val expected = rows.map { case (x, y) => (x, y, morton(x, y, bits)) }.sorted
      assert(got == expected, s"seed $seed bits $bits")
    }
  }

  test("zCellStats == reference histogram (negative keys ride pmod)") {
    for (seed <- 11L to 16L) {
      val rnd      = new scala.util.Random(seed)
      val bits     = 3 + rnd.nextInt(6) // 3..8
      val m        = 1L << bits
      val cellBits = 1 + rnd.nextInt(2 * bits)
      val rows = Seq.fill(60 + rnd.nextInt(120))(
        (rnd.nextLong(4 * m) - 2 * m, rnd.nextLong(4 * m) - 2 * m))
      val got = ZOrder.zCellStats(xyDF(rows, 1 + rnd.nextInt(5)), "x", "y", bits, cellBits)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toSeq
      val expected = rows
        .map { case (x0, y0) => (pmod(x0, m), pmod(y0, m)) }
        .groupBy { case (x, y) => morton(x, y, bits) >> (2 * bits - cellBits) }
        .toSeq
        .map { case (cell, xs) =>
          (cell, xs.size.toLong,
            xs.map(_._1).min, xs.map(_._1).max, xs.map(_._2).min, xs.map(_._2).max)
        }
        .sortBy(_._1)
      assert(got == expected, s"seed $seed bits $bits cellBits $cellBits")
    }
  }

  // --- salting ---------------------------------------------------------------

  /** Skewed keyed corpus: one hot key with ~half the rows, a null-key band,
    * and a long tail; payload column varies so the row-content salt spreads
    * the hot key.
    */
  private def keyed(seed: Long): Seq[(String, Long)] = {
    val rnd = new scala.util.Random(seed)
    val n   = 50 + rnd.nextInt(100)
    (0 until n).map { i =>
      val k = rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 | 4 => "hot"
        case 5                 => null
        case _                 => s"k${rnd.nextInt(12)}"
      }
      (k, rnd.nextLong(1000))
    }
  }

  private def kvDF(rows: Seq[(String, Long)], parts: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("k", StringType, nullable = true),
      StructField("v", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, v) => Row(k, v) }, parts), schema)
  }

  test("saltedCount == plain per-key counts (null keys form a group)") {
    for (seed <- 21L to 26L) {
      val rnd    = new scala.util.Random(seed * 7)
      val rows   = keyed(seed)
      val factor = 2 + rnd.nextInt(7)
      val got = Partitioning.saltedCount(kvDF(rows, 1 + rnd.nextInt(5)), "k", factor)
        .collect()
        .map(r => (Option(r.getString(0)), r.getLong(1)))
        .toSet
      val expected = rows.groupBy(r => Option(r._1)).map { case (k, xs) => (k, xs.size.toLong) }.toSet
      assert(got == expected, s"seed $seed factor $factor")
    }
  }

  test("saltedJoin == plain inner join (duplicate dim keys multiply, null keys drop)") {
    for (seed <- 31L to 36L) {
      val rnd    = new scala.util.Random(seed * 13)
      val fact   = keyed(seed)
      val factor = 2 + rnd.nextInt(7)
      // dimension with duplicate keys and a key absent from the fact side
      val dimKeys = (Seq("hot", "hot", "absent", null: String) ++
        (0 until 8).map(i => s"k$i")).zipWithIndex
      val dim = dimKeys.map { case (k, i) => (k, i.toLong * 10) }
      val got = Partitioning
        .saltedJoin(kvDF(fact, 1 + rnd.nextInt(5)),
          kvDF(dim, 1 + rnd.nextInt(3)).withColumnRenamed("v", "w"), "k", factor)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
      val expected = (for {
        (fk, fv) <- fact if fk != null
        (dk, dw) <- dim if dk == fk
      } yield (fk, fv, dw)).sorted
      assert(got == expected, s"seed $seed factor $factor")
    }
  }

  // --- skew diagnostics ------------------------------------------------------

  test("keySkew == reference with ties forced across the top-K boundary") {
    for (seed <- 41L to 46L) {
      val rnd = new scala.util.Random(seed * 17)
      // many keys with IDENTICAL counts so the (n DESC, key ASC NULLS LAST)
      // tie-break decides which keys fall inside K
      val tieBand = (0 until 12).flatMap(i => Seq.fill(3)((s"t$i", 0L)))
      val rows    = keyed(seed) ++ tieBand ++ Seq.fill(3)((null: String, 0L))
      val topK    = 1 + rnd.nextInt(8)
      val got = Partitioning.keySkew(kvDF(rows, 1 + rnd.nextInt(5)), "k", topK)
        .collect().head
      val counts = rows.groupBy(r => Option(r._1)).map { case (k, xs) => (k, xs.size.toLong) }.toSeq
      val nRows  = rows.size.toLong
      val nKeys  = counts.size.toLong
      val maxKey = counts.map(_._2).max
      // None sorts LAST on the key tie-break (asc_nulls_last / DuckDB default)
      val topRows = counts
        .sortBy { case (k, n) => (-n, k.isEmpty, k.getOrElse("")) }
        .take(topK).map(_._2).sum
      val expected = (nRows, nKeys, maxKey, topRows,
        round6(maxKey.toDouble / nRows), round6(topRows.toDouble / nRows))
      val gotT = (got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
        got.getDouble(4), got.getDouble(5))
      assert(gotT == expected, s"seed $seed topK $topK")
    }
  }

  test("joinSizeProfile: predicted == actual identity; null keys count in totals, never in the join") {
    for (seed <- 51L to 56L) {
      val rnd   = new scala.util.Random(seed * 19)
      val left  = keyed(seed)
      val right = keyed(seed + 100)
      val got = Partitioning
        .joinSizeProfile(kvDF(left, 1 + rnd.nextInt(5)), kvDF(right, 1 + rnd.nextInt(5)), "k", "k")
        .collect().head
      val ca = left.filter(_._1 != null).groupBy(_._1).map { case (k, xs) => (k, xs.size.toLong) }
      val cb = right.filter(_._1 != null).groupBy(_._1).map { case (k, xs) => (k, xs.size.toLong) }
      val shared    = ca.keySet.intersect(cb.keySet)
      val predicted = shared.toSeq.map(k => ca(k) * cb(k)).sum
      // disjoint key sets are a legal draw: sum → NULL (col 3) while the
      // counted join is 0 (col 4) — guard like max_key_pairs so a generator
      // change produces a clean assert, not an NPE (ADVICE r11)
      val expected = (left.size.toLong, right.size.toLong, shared.size.toLong,
        if (shared.isEmpty) null else predicted, predicted,
        if (shared.isEmpty) null else shared.map(k => ca(k) * cb(k)).max)
      val gotT = (got.getLong(0), got.getLong(1), got.getLong(2),
        if (got.isNullAt(3)) null else got.getLong(3), got.getLong(4),
        if (got.isNullAt(5)) null else got.getLong(5))
      assert(gotT == expected, s"seed $seed")
    }
  }

  // --- encoding advisory -----------------------------------------------------

  test("encodingAdvice == NDV reference (nulls excluded from distinct; empty → NULL ratio, plain)") {
    for (seed <- 61L to 66L) {
      val rnd = new scala.util.Random(seed * 23)
      val n   = if (seed == 61L) 0 else 30 + rnd.nextInt(80)
      val rows = Seq.fill(n)((
        if (rnd.nextInt(5) == 0) null else s"c${rnd.nextInt(3)}",    // low-NDV
        rnd.nextLong(1L << 40),                                       // near-unique
        if (rnd.nextInt(3) == 0) null else java.lang.Long.valueOf(rnd.nextLong(4)) // low-NDV with nulls
      ))
      val schema = StructType(Seq(
        StructField("cat", StringType, nullable = true),
        StructField("uid", LongType, nullable = false),
        StructField("code", LongType, nullable = true)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          rows.map { case (a, b, c) => Row(a, b, c) }, 1 + rnd.nextInt(4)), schema)
      val got = Partitioning.encodingAdvice(df, Seq("cat", "uid", "code"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getString(4)))
        .toSeq
      val expected = Seq("cat", "code", "uid").map { c =>
        val vals = c match {
          case "cat"  => rows.map(_._1).filter(_ != null).map(identity[Any])
          case "uid"  => rows.map(_._2).map(identity[Any])
          case "code" => rows.map(_._3).filter(_ != null).map(identity[Any])
        }
        val d     = vals.distinct.size.toLong
        val ratio = if (n > 0) Some(round6(d.toDouble / n)) else None
        val advice =
          if (n > 0 && d.toDouble / n < Partitioning.DictNdvRatio) "dictionary" else "plain"
        (c, n.toLong, d, ratio, advice)
      }
      assert(got == expected, s"seed $seed")
    }
  }
}
