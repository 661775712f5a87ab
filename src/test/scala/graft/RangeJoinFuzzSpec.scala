package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.RangeJoin
import graft.analytics.RangeJoin.Band

/** Differential fuzz of the bucketized range join against the naive
  * nested-loop reference `v >= lo && v < hi`: the cell quantization must be
  * EXACTLY invisible — random overlapping bands (including negative-spanning
  * intervals), random grids that do and don't divide the band edges, fact
  * values sitting exactly ON lo/hi edges and cell boundaries, and NULL
  * values (which drop — inner semantics through a null cell). A value in k
  * overlapping bands must appear exactly k times.
  */
class RangeJoinFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  test("joinBands == nested-loop reference on random overlapping bands and grids") {
    for (seed <- 1L to 10L) {
      val rnd = new scala.util.Random(seed * 11)
      val nBands = 3 + rnd.nextInt(8)
      val bands = (0 until nBands).map { i =>
        val lo = (rnd.nextInt(4000) - 2000) / 10.0 // [-200.0, 200.0), 1-dec
        val w  = (1 + rnd.nextInt(800)) / 10.0
        Band(i.toLong, lo, lo + w)
      }
      val grid = Seq(5.0, 7.3, 10.0, 25.0, 33.1)(rnd.nextInt(5))
      val edgeVals = bands.flatMap(b => Seq(b.lo, b.hi, b.lo - 0.1, b.hi - 0.1))
      val gridVals = (-8 to 8).map(_ * grid)
      val randVals = Seq.fill(60)((rnd.nextInt(8000) - 4000) / 10.0)
      val vals: Seq[java.lang.Double] =
        (edgeVals ++ gridVals ++ randVals).map(java.lang.Double.valueOf) ++
          Seq.fill(3)(null: java.lang.Double)
      val rows = vals.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }
      val schema = StructType(Seq(
        StructField("rid", LongType, nullable = false),
        StructField("v", DoubleType, nullable = true)))
      val fact = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1 + rnd.nextInt(4)), schema)
      val got = RangeJoin.joinBands(fact, "v", bands, grid)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
        .toSeq.sorted
      val expected = (for {
        (v, i) <- vals.zipWithIndex if v != null
        b <- bands if v.doubleValue >= b.lo && v.doubleValue < b.hi
      } yield (i.toLong, v.doubleValue, b.bandId)).sorted
      assert(got == expected, s"seed $seed grid $grid")
    }
  }
}
