package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Pq

/** Product quantization: training determinism, encode shape/bounds, and ADC
  * search sanity. Cross-engine agreement of the declared `pq_*` queries
  * rides the oracle gate (literal-inlined codebooks, ordered float folds).
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val cbs = Pq.trainCodebooks(emb)

  test("trained codebooks: M×K×(dim/M) shape, deterministic across runs") {
    assert(cbs.length == Pq.SubspacesM)
    assert(cbs.forall(_.length <= Pq.CodebookK)) // tiny corpora may clamp seeds
    assert(cbs.forall(_.forall(_.length == 64 / Pq.SubspacesM)))
    val again = Pq.trainCodebooks(emb)
    assert(cbs.map(_.map(_.toSeq).toSeq).toSeq == again.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("codes: one row per (vector, subspace), codes within the codebook, nonneg error") {
    val rows = Pq.codesDF(emb, cbs).collect()
    val n = emb.count()
    assert(rows.length == n * Pq.SubspacesM)
    assert(rows.forall(r => r.getAs[Long]("code") >= 0 && r.getAs[Long]("code") < Pq.CodebookK))
    assert(rows.forall(_.getAs[Double]("dist_r") >= 0.0))
  }

  test("ADC top-k: k rows per query, self lands in its own top-k, ascending distance") {
    val qids = Seq(0L, 1L, 2L)
    val rows = Pq.adcTopK(emb, cbs, qids, k = 10).collect()
    qids.foreach { q =>
      val mine = rows.filter(_.getAs[Long]("qid") == q)
      assert(mine.length == 10)
      // the query vector's own codes minimize the ADC sum up to quantization
      // error — it must appear in its own neighborhood
      assert(mine.exists(_.getAs[Long]("vec_id") == q), s"query $q missing from its own top-k")
      val ds = mine.map(_.getAs[Double]("adc_r")).toSeq
      assert(ds == ds.sorted)
    }
  }
}
