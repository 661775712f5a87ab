package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.scale.Partitioning
import graft.text.TextOps

/** Round-10e operator wave: join-size profiling, encoding advisory, CUBE
  * totals.
  */
class R10eOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs     = Tables.load(spark, dir, "documents")
  private lazy val customer = Tables.load(spark, dir, "customer")

  // --- joinSizeProfile ------------------------------------------------------

  test("joinSizeProfile: histogram prediction is exact at full granularity") {
    val left  = Seq(1, 1, 1, 2, 3).map(k => (k, "l")).toDF("k", "pl")
    val right = Seq(1, 1, 2, 2, 4).map(k => (k, "r")).toDF("k", "pr")
    val r = Partitioning.joinSizeProfile(left, right, "k", "k").collect().head
    assert(r.getLong(0) == 5 && r.getLong(1) == 5) // n_left, n_right
    assert(r.getLong(2) == 2)                      // shared keys {1, 2}
    assert(r.getLong(3) == 3 * 2 + 1 * 2)          // predicted = Σ ca·cb = 8
    assert(r.getLong(4) == r.getLong(3))           // identity vs the real join
    assert(r.getLong(5) == 6)                      // hottest key 1 → 3·2 pairs
  }

  test("joinSizeProfileGated: all-keys estimate unchanged, gated identity holds, subset non-trivial") {
    val li   = Tables.load(spark, dir, "lineitem")
    val full = Partitioning.joinSizeProfile(li, li, "l_partkey", "l_partkey").collect().head
    val g    = Partitioning.joinSizeProfileGated(li, li, "l_partkey", "l_partkey").collect().head
    // the histogram arm still covers ALL keys — same numbers as the full form
    assert(g.getLong(0) == full.getLong(0) && g.getLong(1) == full.getLong(1))
    assert(g.getLong(2) == full.getLong(2))                   // n_join_keys
    assert(g.getLong(3) == full.getLong(3))                   // predicted_rows
    assert(g.getLong(4) == full.getLong(5))                   // max_key_pairs
    // the gated validation arm: the estimate is an exact identity on the subset
    assert(g.getLong(6) == g.getLong(7), "gated predicted != gated actual")
    // the declared 1/16 gate actually bites: a real subset, strictly smaller
    assert(g.getLong(5) > 0 && g.getLong(5) < full.getLong(2))
    assert(g.getLong(7) < full.getLong(3))
  }

  // --- encodingAdvice -------------------------------------------------------

  test("encodingAdvice: repeat-heavy columns dictionary, near-unique plain") {
    val rows = Partitioning.encodingAdvice(customer, Tables.columns("customer")).collect()
    val n = customer.count()
    // the advice IS the declared rule applied to the measured ratio
    rows.foreach { r =>
      val expected = if (r.getLong(2).toDouble / n < Partitioning.DictNdvRatio) "dictionary" else "plain"
      assert(r.getString(4) == expected, r.toString)
    }
    val m = rows.map(r => r.getString(0) -> (r.getLong(2), r.getString(4))).toMap
    assert(m("c_custkey")._1 == n && m("c_custkey")._2 == "plain")
    assert(m("c_mktsegment")._1 <= 5 && m("c_mktsegment")._2 == "dictionary")
  }

  // --- mixtureCube ----------------------------------------------------------

  test("mixtureCube: all four grouping sets present and mutually consistent") {
    val rows = TextOps.mixtureCube(docs).collect()
    val byGid = rows.groupBy(_.getLong(2))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    val total = docs.count()
    // grand total (gid=3) is one row carrying the whole corpus
    assert(byGid(3L).length == 1 && byGid(3L).head.getLong(3) == total)
    // each marginal sums back to the corpus
    assert(byGid(1L).map(_.getLong(3)).sum == total) // per-lang subtotals
    assert(byGid(2L).map(_.getLong(3)).sum == total) // per-source marginal (CUBE-only)
    assert(byGid(0L).map(_.getLong(3)).sum == total) // leaf cells
    // the CUBE-only slice has one row per source
    assert(byGid(2L).length == docs.select("source").distinct().count())
  }

  test("mixtureCube plan: one Expand pass, not a union of aggregates") {
    val p = TextOps.mixtureCube(docs).queryExecution.executedPlan.toString
    assert(p.contains("Expand") && !p.contains("Union"))
  }
}
