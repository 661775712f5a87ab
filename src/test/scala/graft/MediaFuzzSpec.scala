package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaFixtureGen, MediaOps}
import graft.multimodal.MediaOps.ImageIoDecoder

/** Differential fuzz of the multimodal decode seam (VERDICT r12 ask #4):
  * random mutations of REAL PNG/BMP payloads — truncations at arbitrary
  * offsets, bit flips anywhere in the byte stream, garbage prefixes/suffixes,
  * and intact controls — pushed through the distributed seam
  * ([[MediaOps.decodeImages]] with carry columns) and compared row-for-row
  * against a driver-side per-payload JDK decode of the SAME mutated bytes.
  *
  * What this proves beyond the committed fixture (whose 6 corrupt payloads
  * are hand-picked): on arbitrary corruptions, (a) the accept/reject
  * predicate is identical between the fast path (`canDecode`, no raster
  * pass) and the stats path (`decode`) — the two-method seam cannot drift;
  * (b) the Spark seam quarantines exactly what the driver-side reference
  * rejects and never fails a partition on hostile bytes; (c) when a mutated
  * payload still decodes (bit flips in BMP pixel data usually do), the
  * distributed channel sums equal the reference decode of those exact
  * mutated bytes — not the pristine encode-time truth.
  */
class MediaFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark

  /** One random mutation of a valid payload. */
  private def mutate(bytes: Array[Byte], rnd: scala.util.Random): Array[Byte] =
    rnd.nextInt(6) match {
      case 0 => bytes.take(rnd.nextInt(bytes.length + 1))            // truncate
      case 1 =>                                                      // flip 1-4 bits
        val out = bytes.clone()
        (0 until 1 + rnd.nextInt(4)).foreach { _ =>
          val i = rnd.nextInt(out.length)
          out(i) = (out(i) ^ (1 << rnd.nextInt(8))).toByte
        }
        out
      case 2 => Array.fill[Byte](rnd.nextInt(40))(rnd.nextInt.toByte) ++ bytes // garbage prefix
      case 3 => bytes ++ Array.fill[Byte](rnd.nextInt(40))(rnd.nextInt.toByte) // garbage suffix
      case 4 => Array.fill[Byte](1 + rnd.nextInt(64))(rnd.nextInt.toByte)      // pure garbage
      case _ => bytes                                                // intact control
    }

  test("decodeImages + canDecode == driver-side JDK decode on 6 corpora of mutated real images") {
    val valid = MediaFixtureGen.rows(10)
    for (seed <- 1L to 6L) {
      val rnd = new scala.util.Random(seed * 101)
      val payloads: Seq[(Long, String, Array[Byte])] = (0 until 40).map { i =>
        val base = valid(rnd.nextInt(valid.length))
        (i.toLong, base.kind, mutate(base.payload, rnd))
      }
      // driver-side reference: one plain JDK decode per mutated payload
      val ref = payloads.map { case (id, kind, bytes) =>
        id -> (kind, ImageIoDecoder.decode(bytes))
      }.toMap
      // the fast predicate and the stats path must agree on every payload
      payloads.foreach { case (id, _, bytes) =>
        assert(ImageIoDecoder.canDecode(bytes) == ref(id)._2.isDefined,
          s"seed=$seed id=$id: canDecode disagrees with decode")
      }
      val schema = StructType(Seq(
        StructField("media_id", LongType, nullable = false),
        StructField("kind", StringType, nullable = true),
        StructField("payload", BinaryType, nullable = true)))
      val rows = payloads.map { case (id, kind, bytes) => Row(id, kind, bytes) }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 5), schema)
      val got = MediaOps.decodeImages(df, "media_id", "payload", carryCols = Seq("kind"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3),
          r.getLong(4), r.getLong(5), r.getLong(6))))
        .toMap
      val expected = ref.collect { case (id, (kind, Some(s))) =>
        id -> ((kind, s.width, s.height, s.sumR, s.sumG, s.sumB))
      }
      assert(got == expected,
        s"seed=$seed: seam kept ${got.keySet.toSeq.sorted} vs reference " +
          s"${expected.keySet.toSeq.sorted}")
    }
  }

  test("quarantine counts through the seam == driver reference on mutated payloads") {
    import spark.implicits._
    val valid = MediaFixtureGen.rows(8)
    for (seed <- 7L to 10L) {
      val rnd = new scala.util.Random(seed * 977)
      val payloads = (0 until 30).map { i =>
        val base = valid(rnd.nextInt(valid.length))
        (base.kind, mutate(base.payload, rnd))
      }
      val refCounts = payloads.groupBy(_._1).map { case (k, ps) =>
        k -> ((ps.size.toLong, ps.count(p => ImageIoDecoder.decode(p._2).isDefined).toLong))
      }
      val got = payloads.toDF("kind", "payload")
        .select(org.apache.spark.sql.functions.col("kind"),
          org.apache.spark.sql.functions.col("payload").cast("binary"))
        .as[(String, Array[Byte])]
        .mapPartitions(it => it.map { case (k, b) =>
          (k, if (ImageIoDecoder.canDecode(b)) 1L else 0L) })
        .toDF("kind", "ok")
        .groupBy("kind")
        .agg(org.apache.spark.sql.functions.count("*").as("n"),
          org.apache.spark.sql.functions.sum("ok").as("dec"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got == refCounts, s"seed=$seed")
    }
  }

  test("featurize with the deterministic fake decoder == MD5 reference on random bytes") {
    val rnd = new scala.util.Random(31L)
    val payloads = (0 until 25).map { i =>
      i.toLong -> Array.fill[Byte](rnd.nextInt(200))(rnd.nextInt.toByte)
    }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(payloads.map { case (id, b) => Row(id, b) }, 3), schema)
    val got = MediaOps.featurize(df, "id", "payload", MediaOps.DeterministicFakeDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toVector).toMap
    val ref = payloads.map { case (id, b) =>
      val d = java.security.MessageDigest.getInstance("MD5").digest(b)
      id -> Vector.tabulate(8)(i => (d(i) & 0xff) / 255.0f)
    }.toMap
    assert(got == ref)
  }
}
