package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Packing

/** Sequence-packing invariants (library operator — partition-dependent, so
  * spec-asserted rather than oracle-declared).
  */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val realDocs = Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("every doc packed exactly once; no pack exceeds the budget (except singletons)") {
    val max = 256L
    val packed = Packing.packSequences(realDocs, max).collect()
    assert(packed.map(_.docId).sorted.toSeq ==
      realDocs.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    val byPack = packed.groupBy(_.packId)
    for ((pid, members) <- byPack) {
      val total = members.map(_.nTokens).sum
      assert(total <= max || members.length == 1, s"pack $pid over budget with ${members.length} members")
      // seq_pos is a dense 0-based order within the pack
      assert(members.map(_.seqPos).sorted.toSeq == members.indices.toSeq)
    }
  }

  test("declared deterministic twin replays the greedy recurrence in global doc_id order") {
    val max = 96L
    val got = Packing.packDeterministic(realDocs, max).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // driver-side reference: the same greedy next-fit over the collected corpus
    val inOrder = got.sortBy(_._1)
    var pack = 0L; var used = 0L; var pos = 0L; var started = false
    val expected = inOrder.map { case (docId, n, _, _) =>
      if (!started || used + n > max) { if (started) pack += 1; used = 0L; pos = 0L; started = true }
      used += n
      val row = (docId, n, pack, pos)
      pos += 1
      row
    }
    assert(inOrder.toSeq == expected.toSeq)
    // the fixture exercises BOTH branches: multi-doc packs and over-budget singletons
    val sizes = got.groupBy(_._3).view.mapValues(_.length)
    assert(sizes.values.exists(_ > 1) && got.exists(_._2 > max))
  }

  test("packing is deterministic for the same input") {
    val a = Packing.packSequences(realDocs, 512L).collect().map(p => (p.packId, p.docId)).toSet
    val b = Packing.packSequences(realDocs, 512L).collect().map(p => (p.packId, p.docId)).toSet
    assert(a == b)
  }

  test("packing efficiency beats one-doc-per-sequence on the real corpus") {
    val max    = 512L
    val packed = Packing.packSequences(realDocs, max)
    val eff    = Packing.packingEfficiency(packed, max)
    // one-doc-per-sequence baseline: mean tokens / budget
    val meanTokens = packed.collect().map(_.nTokens).sum.toDouble / packed.count()
    val baseline   = meanTokens / max
    assert(eff > baseline, s"packed $eff vs unpacked $baseline")
    assert(eff > 0.5, s"greedy next-fit should fill most of each sequence: $eff")
  }

  test("over-budget docs become singleton packs") {
    val docs = Seq(
      (1L, Seq.fill(20)("w").mkString(" ")),
      (2L, "a b"),
      (3L, "c d")
    ).map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val packed = Packing.packSequences(docs, maxTokens = 5L).collect()
    val bigPack = packed.find(_.docId == 1L).get.packId
    assert(packed.count(_.packId == bigPack) == 1)
  }
}
