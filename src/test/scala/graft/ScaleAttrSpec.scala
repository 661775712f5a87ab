package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.{KMeans, Pq, ScaleAttr, SimilarityOps}

/** Pins the [[graft.similarity.ScaleAttr]] diagnostic mirror against the
  * production IVF+PQ plan: the attribution tool re-derives the candidate
  * relation `ivfPqTopK` ADC-scores (same argmax cell assignment, same
  * nprobe expansion) to COUNT it without touching the declared query's
  * byte-frozen plan — so an edit that lets the two drift must fail here,
  * not silently misattribute the scale curve (VERDICT r18 #1).
  */
class ScaleAttrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val cents =
    SimilarityOps.canonicalizeCentroids(KMeans.trainCentroids(emb))
  private lazy val cbs = Pq.trainCodebooks(emb)

  test("every reranked ivfPqTopK hit comes out of the mirrored candidate relation") {
    val cand = ScaleAttr.ivfCandidates(emb, cents)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val hits = Pq.ivfPqTopK(emb, cents, cbs)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
    assert(hits.nonEmpty)
    val escaped = hits.filterNot(cand)
    assert(escaped.isEmpty,
      s"ivfPqTopK returned pairs outside the mirrored candidate set " +
        s"(mirror drifted from Pq.scala's cells⋈probes): ${escaped.take(5).toSeq}")
  }

  test("candidate volume is the pruned fraction, not the corpus cross product") {
    val qids = Seq(0L, 1L, 2L)
    val n    = ScaleAttr.liveVectors(emb)
    val c    = ScaleAttr.ivfCandidates(emb, cents, qids).count()
    // nprobe=4 of IvfCentroids cells: strictly fewer pairs than |Q|·N unless
    // the trainer degenerated to ≤ nprobe live cells (impossible at the
    // committed k on this fixture), and at least one candidate per query
    assert(c > 0 && c < qids.size * n,
      s"candidates=$c outside (0, ${qids.size * n}) — prune not pruning")
    // each query's own vector sits in a probed cell (its argmax cell is its
    // own top-1 probe), so (q, q) must be a candidate
    val cand = ScaleAttr.ivfCandidates(emb, cents, qids)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    qids.foreach(q => assert(cand((q, q)), s"query $q missing from its own candidates"))
  }
}
