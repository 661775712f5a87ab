package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.DedupOps
import graft.sampling.Sampling
import graft.scale.Partitioning

/** Round-10 operator wave: train/val/test split banding, MinHash banding
  * precision/recall, and key-skew diagnostics. Cross-engine agreement of the
  * declared forms is the oracle gate's job; these specs prove the operator
  * properties the oracles can't express.
  */
class R10OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private lazy val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")

  // --- splitAssign / splitReport -------------------------------------------

  test("splitAssign: every row gets exactly one label, rates near 80/10/10") {
    val out = Sampling.splitAssign(docs, "doc_id", 0.8, 0.1)
    val n = docs.count()
    assert(out.count() == n) // no row dropped or duplicated
    val byS = out.groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.keySet.subsetOf(Set("train", "val", "test")))
    assert(math.abs(byS("train") - 0.8 * n) < 0.1 * n, s"train ${byS("train")} of $n")
    assert(math.abs(byS.getOrElse("val", 0L) - 0.1 * n) < 0.08 * n + 3)
    assert(math.abs(byS.getOrElse("test", 0L) - 0.1 * n) < 0.08 * n + 3)
  }

  test("splitAssign: growing the train share only moves rows train-ward") {
    def sets(trainFrac: Double, valFrac: Double): Map[String, Set[Long]] =
      Sampling.splitAssign(docs, "doc_id", trainFrac, valFrac)
        .select("split", "doc_id").collect()
        .groupMap(_.getString(0))(_.getLong(1)).view.mapValues(_.toSet).toMap
    val small = sets(0.5, 0.1)
    val big   = sets(0.8, 0.1)
    // train is monotone: every doc trained at 50% is still trained at 80%
    assert(small("train").subsetOf(big("train")))
    // test is anti-monotone: shrinks as train+val grows
    assert(big("test").subsetOf(small("test")))
  }

  test("splitReport: counts roll up to the corpus") {
    val rep = Sampling.splitReport(docs).collect()
    assert(rep.map(_.getLong(2)).sum == docs.count())
    assert(rep.forall(_.getLong(3) > 0)) // every (split, lang) stratum has tokens
  }

  // --- minhashRecall --------------------------------------------------------

  test("minhashRecall: counts agree with the two pair sets, ratios bounded") {
    val truth = DedupOps.jaccardPairs(docs).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = DedupOps.minhashCandidatePairs(docs).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val row = DedupOps.minhashRecall(docs).collect().head
    assert(row.getLong(0) == truth.size)
    assert(row.getLong(1) == cand.size)
    assert(row.getLong(2) == (truth & cand).size)
    val (recall, precision) = (row.getDouble(3), row.getDouble(4))
    assert(recall >= 0.0 && recall <= 1.0)
    assert(precision >= 0.0 && precision <= 1.0)
    // the sf corpus's near-dups are strong (clones with small edits) — the
    // 8-band/4-row banding should catch most of them
    assert(recall > 0.5, s"recall $recall suspiciously low for the clone corpus")
  }

  // --- keySkew --------------------------------------------------------------

  test("keySkew: exact counts and shares on a hand-built skewed frame") {
    // one hot key (10 rows) + four singletons
    val df = ((1 to 10).map(i => (7L, i)) ++ Seq((1L, 0), (2L, 0), (3L, 0), (4L, 0)))
      .toDF("k", "v")
    val r = Partitioning.keySkew(df, "k", topK = 2).collect().head
    assert(r.getLong(0) == 14L) // n_rows
    assert(r.getLong(1) == 5L)  // n_keys
    assert(r.getLong(2) == 10L) // max_key_rows
    assert(r.getLong(3) == 11L) // top-2 = hot(10) + first singleton(1)
    // shares are rounded to 6 decimals (the repo float convention)
    assert(r.getDouble(4) == math.rint(10.0 / 14 * 1e6) / 1e6)
    assert(r.getDouble(5) == math.rint(11.0 / 14 * 1e6) / 1e6)
  }

  test("keySkew: uniform keys show no concentration") {
    val df = (1 to 100).map(i => (i.toLong, i)).toDF("k", "v")
    val r = Partitioning.keySkew(df, "k", topK = 10).collect().head
    assert(r.getLong(1) == 100L)
    assert(r.getLong(2) == 1L)
    assert(math.abs(r.getDouble(5) - 0.1) < 1e-9) // top-10 of 100 uniform = 10%
  }
}
