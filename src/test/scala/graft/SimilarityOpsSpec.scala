package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.SimilarityOps

/** Behavior of the similarity tiers on planted structure. Cross-engine
  * agreement of cosineTopK/lshBuckets is covered by the DuckDB oracle gate
  * (knn_embeddings / lshbuckets_embeddings).
  */
class SimilarityOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** 3 clusters of 5 near-identical vectors + noise vectors. */
  private lazy val clustered = {
    val rnd = new scala.util.Random(7)
    def unit(): Array[Float] = Array.fill(SimilarityOps.Dim)((rnd.nextDouble() - 0.5).toFloat)
    val rows = (0 until 3).flatMap { c =>
      val center = unit()
      (0 until 5).map { m =>
        val v = center.map(x => x + (rnd.nextDouble() * 0.01 - 0.005).toFloat)
        ((c * 5 + m).toLong, v, c)
      }
    } ++ (15 until 40).map(i => (i.toLong, unit(), 99))
    rows.toDF("vec_id", "embedding", "label")
  }

  test("cosineTopK: query's own vector ranks first at sim 1.0; cluster mates fill top-5") {
    val top = SimilarityOps.cosineTopK(clustered, queryIds = Seq(0L, 5L), k = 5).collect()
    val byQ = top.groupBy(_.getAs[Long]("qid"))
    for ((q, rows) <- byQ) {
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.head.getAs[Long]("vec_id") == q)
      assert(sorted.head.getAs[Double]("sim_r") == 1.0)
      val cluster = (q / 5) * 5
      val mates = sorted.map(_.getAs[Long]("vec_id")).toSet
      assert(mates == (cluster until cluster + 5).toSet, s"q=$q got $mates")
    }
  }

  test("lshBuckets: cluster mates land within hamming-1 of each other") {
    val b = SimilarityOps.lshBuckets(clustered).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    for (c <- 0 until 3) {
      val buckets = (c * 5 until c * 5 + 5).map(i => b(i.toLong)).toSet
      // a hyperplane may pass near a cluster center and split it — that is
      // what hamming-1 multiprobe in annTopK exists for; but mates must stay
      // within one bit of each other
      val maxHam = (for (x <- buckets; y <- buckets)
        yield java.lang.Long.bitCount(x ^ y)).max
      assert(maxHam <= 1, s"cluster $c spread across $buckets (hamming $maxHam)")
    }
    assert(b.values.toSet.size > 3) // noise occupies other buckets
  }

  test("cosineDupPairs: planted cluster pairs found exactly, noise suppressed") {
    val pairs = SimilarityOps.cosineDupPairs(clustered, threshold = 0.9).collect()
    val got = pairs.map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    // every within-cluster pair qualifies (vectors differ by ±0.005 noise)
    val expected = (0 until 3).flatMap { c =>
      val ids = (c * 5 until c * 5 + 5).map(_.toLong)
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    assert(expected.subsetOf(got), s"missing ${expected -- got}")
    // no cross-cluster or noise pair reaches 0.9
    assert(got == expected, s"unexpected ${got -- expected}")
    assert(pairs.forall(_.getAs[Double]("sim_r") >= 0.9))
  }

  test("ivfAssign + ivfTopK: self-cells for centroids, probing recovers the cluster") {
    // vec_ids 0..15 ARE the centroids (fixture overlap is deliberate): every
    // centroid must assign to its own cell at sim 1.0
    val rows = SimilarityOps.ivfAssign(clustered).collect()
    val assign = rows.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("centroid_id")).toMap
    for (i <- 0L until SimilarityOps.IvfCentroids.toLong) {
      assert(assign(i) == i, s"centroid $i assigned to ${assign(i)}")
    }
    // non-centroid vectors all land in some valid cell
    assert(rows.forall(r => r.getAs[Long]("centroid_id") < SimilarityOps.IvfCentroids))
    // cluster-0 mates are each their own centroid, so probing the query's 5
    // closest cells covers exactly the planted cluster
    val ivf = SimilarityOps.ivfTopK(clustered, queryIds = Seq(0L), k = 5, nprobe = 5).collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(ivf.head.getAs[Long]("vec_id") == 0L)
    assert(ivf.map(_.getAs[Long]("vec_id")).toSet == (0L until 5L).toSet)
  }

  test("annTopK: bucketed search recovers the cluster with exact rerank order") {
    val ann = SimilarityOps.annTopK(clustered, queryIds = Seq(0L), k = 5).collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(ann.head.getAs[Long]("vec_id") == 0L)
    val got = ann.map(_.getAs[Long]("vec_id")).toSet
    assert((0L until 5L).toSet.subsetOf(got), s"recall miss: $got")
    // agreement with brute force on the planted cluster
    val brute = SimilarityOps.cosineTopK(clustered, queryIds = Seq(0L), k = 5).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    assert(got == brute)
  }
}
