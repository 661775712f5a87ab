package graft

import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.BloomProbeKernel

/** The native Bloom probe's hash contract: `mightContainBinary` over a
  * UTF8String's bytes must answer EXACTLY like the `mightContainString`
  * probe the prior UDF formulation used, on every string a hostile corpus
  * can produce — multi-byte CJK/emoji (where a UTF-8 byte-level divergence
  * would actually show), combining marks, embedded quotes, whitespace
  * pathologies. A divergence here would silently change which corpus
  * shingles survive the pre-distinct prune.
  */
class BloomProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val hostile = Seq(
    "plain shingle text", "", " ", "  double  spaced", "trailing   ",
    "的 是 了", "😀 🎉 🔥", "مرحبا بالعالم", "é à vérité", "İstanbul ı i",
    "ΟΔΟΣ ΣΟΦΟΣ ς", "quote \" and ' mix", "tab\there", "a" * 300,
    " control", "ﬀ ligature ß sharp")

  test("kernel probe == mightContainString on hostile unicode, member and non-member") {
    val rnd = new scala.util.Random(42L)
    for (trial <- 1 to 4) {
      val bloom = BloomFilter.create(2000, 0.01)
      // half the pool inserted (some via putString, some via putBinary —
      // the two put paths hash identically by the same byte contract)
      val members = hostile.zipWithIndex.filter(_._2 % 2 == trial % 2).map(_._1) ++
        (0 until 50).map(i => s"extra member $trial $i ${rnd.nextInt()}")
      members.zipWithIndex.foreach { case (s, i) =>
        if (i % 2 == 0) bloom.putString(s)
        else bloom.putBinary(s.getBytes("UTF-8"))
      }
      val kernel = new BloomProbeKernel(spark.sparkContext.broadcast(bloom))
      val probes = hostile ++ members ++ (0 until 50).map(i => s"absent $trial $i")
      probes.foreach { s =>
        assert(kernel.mightContain(UTF8String.fromString(s)) == bloom.mightContainString(s),
          s"trial=$trial: probe diverges from mightContainString on ${s.take(40)}")
      }
      // no false negatives, ever — the filter's one hard guarantee
      members.foreach(s => assert(kernel.mightContain(UTF8String.fromString(s))))
    }
  }

  test("invalid UTF-8 probes RAW bytes (documented divergence from the legacy String-repair path)") {
    // ADVICE r13: on ill-formed UTF-8 the retired UDF decoded to
    // java.lang.String first, silently repairing invalid sequences to
    // U+FFFD before hashing; the native kernel hashes the raw bytes. This
    // case pins the INTENDED raw-bytes semantics: a putBinary'd invalid
    // payload is found by the kernel (no repair between put and probe),
    // while the repaired U+FFFD rendering hashes differently.
    val invalid = Seq(
      Array(0xC3.toByte),                              // truncated 2-byte seq
      Array(0xFF.toByte, 0xFE.toByte),                 // bytes never valid in UTF-8
      Array('a'.toByte, 0xE2.toByte, 0x82.toByte),     // truncated 3-byte seq
      Array(0xC0.toByte, 0xAF.toByte))                 // overlong encoding
    for (bytes <- invalid) {
      val bloom = BloomFilter.create(100, 0.01)
      bloom.putBinary(bytes)
      val kernel = new BloomProbeKernel(spark.sparkContext.broadcast(bloom))
      val u = UTF8String.fromBytes(bytes)
      // raw-bytes contract: what was put is found, byte-for-byte
      assert(kernel.mightContain(u), s"raw bytes ${bytes.mkString(",")} must probe true")
      assert(kernel.mightContain(u) == bloom.mightContainBinary(u.getBytes))
      // the legacy repair path would have probed the U+FFFD rendering — a
      // DIFFERENT key. The meaningful pin is the byte-level inequality
      // below: the repair changed the bytes for every vector above, so the
      // kernel and the legacy path hash different keys (ADVICE r14: the
      // old conditional `kernel != mightContainString(repaired)` assert
      // was vacuous — both sides were already fixed by the guards — so it
      // is dropped rather than kept as false assurance).
      val repaired = new String(bytes, "UTF-8")
      assert(!java.util.Arrays.equals(repaired.getBytes("UTF-8"), bytes))
    }
  }

  test("expression filters a frame identically to a driver-side mightContainString sweep") {
    import spark.implicits._
    val bloom = BloomFilter.create(100, 0.01)
    val kept = Seq("的 是 了", "😀 🎉 🔥", "kept plain")
    kept.foreach(bloom.putString)
    val bcast = spark.sparkContext.broadcast(bloom)
    val all = hostile ++ kept
    val got = all.toDF("s")
      .where(graft.dedup.BloomMightContain(org.apache.spark.sql.functions.col("s"), bcast))
      .collect().map(_.getString(0)).toSet
    val ref = all.filter(bloom.mightContainString).toSet
    assert(got == ref)
  }
}
