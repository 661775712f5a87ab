package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dedup.{DedupClusters, DedupOps}
import graft.text.TextOps

/** Round-11b operator wave: per-language quality percentile rank, pairwise
  * vocabulary overlap, cross-source duplication matrix.
  */
class R11bOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = Tables.load(spark, dir, "documents")

  // --- qualityRank ----------------------------------------------------------

  test("qualityRank: ranks are a per-language permutation and respect the order") {
    val rows = TextOps.qualityRank(docs).collect()
    val byLang = rows.groupBy(_.getString(1))
    byLang.foreach { case (lang, rs) =>
      val ranks = rs.map(_.getLong(3)).sorted
      assert(ranks.toSeq == (1L to rs.length).toSeq, s"$lang ranks not a permutation")
      // ordered by rank, token counts never increase
      val inRank = rs.sortBy(_.getLong(3)).map(_.getLong(2))
      inRank.sliding(2).foreach {
        case Array(a, b) => assert(a >= b)
        case _           =>
      }
    }
    // percentile of the first rank is 0, of the last is 1 (rows > 1 per lang)
    byLang.values.filter(_.length > 1).foreach { rs =>
      val sorted = rs.sortBy(_.getLong(3))
      assert(sorted.head.getDouble(4) == 0.0 && sorted.last.getDouble(4) == 1.0)
    }
  }

  test("qualityRank: qbucket sizes differ by at most one per language") {
    val rows = TextOps.qualityRank(docs).collect()
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val sizes = rs.groupBy(_.getLong(5)).values.map(_.length)
      assert(sizes.max - sizes.min <= 1)
    }
  }

  // --- vocabOverlap ---------------------------------------------------------

  test("vocabOverlap: symmetric construction on a fixture with known overlap") {
    val d = Seq(
      (1L, "a b c", "en", "s1", 5L), (2L, "a b d", "en", "s2", 5L),
      (3L, "x y z", "en", "s3", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = TextOps.vocabOverlap(d, k = 10)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // s1={a,b,c}, s2={a,b,d} share {a,b}; s3 shares nothing (pairs drop out)
    assert(got == Map(("s1", "s2") -> 2L))
  }

  test("vocabOverlap: jaccard is shared/(2k - shared) and bounded by 1") {
    val rows = TextOps.vocabOverlap(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (shared, j) = (r.getLong(2), r.getDouble(3))
      assert(j == shared.toDouble / (200L - shared).toDouble)
      assert(j > 0.0 && j <= 1.0)
    }
  }

  // --- crossSourceDups ------------------------------------------------------

  test("crossSourceDups: closed form equals pair enumeration on the real labels") {
    val labels = DedupClusters.dedupClusters(docs)
    val got = DedupOps.crossSourceDups(labels, docs)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // enumerate same-cluster doc pairs driver-side and bucket by source pair
    val tagged = labels.join(docs.select("doc_id", "source"), "doc_id")
      .select("cluster_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val brute = tagged.groupBy(_._1).values.flatMap { members =>
      for (i <- members.indices; j <- (i + 1) until members.length) yield {
        val (a, b) = (members(i)._2, members(j)._2)
        if (a <= b) (a, b) else (b, a)
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == brute)
    assert(got.values.sum > 0, "fixture corpus has dup clusters; matrix must be non-empty")
  }
}
