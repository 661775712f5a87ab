package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.stats.{MergeableStats, StatsPass}

/** Incremental profiling: per-slice partial states must merge into the same
  * profile a full scan produces — counts and pattern ratios exactly,
  * distincts within HLL error.
  */
class MergeableStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("merged slice partials equal the full-scan profile (counts exact, distinct ~2%)") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val cols = li.columns.toSeq.filter(_ != "l_linestatus")

    val partials = MergeableStats.partials(li, "l_linestatus")
    assert(partials.count() >= 2) // several slices actually merged

    val merged = MergeableStats.merge(partials, cols)
    val full   = StatsPass.compute(li.drop("l_linestatus")) // same column set

    val fullBy = full.map(s => s.name -> s).toMap
    for (m <- merged) {
      val f = fullBy(m.name)
      assert(m.totalRows == f.totalRows, s"${m.name} total")
      assert(m.nonNullCount == f.nonNullCount, s"${m.name} nn")
      assert(m.patternMatches == f.patternMatches, s"${m.name} pattern counts must merge exactly")
      val tol = math.max(3L, (f.uniqueCount * 0.05).toLong)
      assert(math.abs(m.uniqueCount - f.uniqueCount) <= tol,
        s"${m.name}: merged distinct ${m.uniqueCount} vs exact ${f.uniqueCount}")
    }
  }

  test("re-profiling one slice and re-merging updates the profile (incremental semantics)") {
    import spark.implicits._
    val day1 = Seq(("d1", "a@b.com"), ("d1", "c@d.org")).toDF("day", "mail")
    val day2 = Seq(("d2", "e@f.net")).toDF("day", "mail")
    val p1 = MergeableStats.partials(day1, "day")
    val p2 = MergeableStats.partials(day2, "day")
    val both = MergeableStats.merge(p1.union(p2), Seq("mail"))
    assert(both.head.totalRows == 3)
    assert(both.head.patternMatches("email_1") == 3)
    // drop day2's partial: the merged profile reflects only day1 — no rescan
    val only1 = MergeableStats.merge(p1, Seq("mail"))
    assert(only1.head.totalRows == 2)
  }
}
