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

  test("semanticDupPairs: within-cell pairs found, cross-cell pairs honestly missed") {
    // centroids = the 3 cluster centers (approximated by members 0/5/10) +
    // one far-off cell; every cluster collapses into its own cell
    val members = clustered.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    val cents = SimilarityOps.canonicalizeCentroids(
      Array(members(0L), members(5L), members(10L)))
    val pairs = SimilarityOps.semanticDupPairs(clustered, cents, threshold = 0.9).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    // every within-cluster pair shares a cell and clears the threshold
    val expected = (for {
      c <- 0 until 3
      a <- c * 5 until c * 5 + 5
      b <- (a + 1) until c * 5 + 5
    } yield (a.toLong, b.toLong)).toSet
    assert(expected.subsetOf(pairs), s"missing ${expected -- pairs}")
    // emitted sims are exact and above threshold; no cross-cluster planted pair
    assert(pairs.forall { case (a, b) => (a / 5 == b / 5) || a >= 15 || b >= 15 })
  }

  test("semanticDupPairs plan: pair generation is an equi-join on the cell id, not all-pairs") {
    val cents = Array.tabulate(4, SimilarityOps.Dim)((i, j) => (i * SimilarityOps.Dim + j + 1).toDouble / 100.0)
    val p = SimilarityOps.semanticDupPairs(clustered, cents).queryExecution.executedPlan.toString
    // the ONLY nested-loop joins allowed are the k-row centroid broadcasts
    // feeding the argmax; the vector-vs-vector pair join must key on the cell
    val bnlj = "BroadcastNestedLoopJoin".r.findAllMatchIn(p).size
    assert(bnlj <= 2, s"pair join degenerated to nested loop ($bnlj):\n$p")
    assert(!p.contains("CartesianProduct"), s"all-pairs product in plan:\n$p")
    assert(p.contains("centroid_id"), p)
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

  test("embeddingOutliers: picks the globally lowest assigned-cell similarities, ascending") {
    val cents = Array.tabulate(4, SimilarityOps.Dim)((i, j) => (i * SimilarityOps.Dim + j + 1).toDouble / 100.0)
    val out = SimilarityOps.embeddingOutliers(clustered, cents, k = 5).collect()
    assert(out.length == 5)
    val sims = out.map(_.getAs[Double]("sim_r")).toSeq
    assert(sims == sims.sorted, s"not ascending: $sims")
    // the cut is the global minimum: no excluded vector has a lower sim
    val all = SimilarityOps.ivfAssignTrained(clustered, cents).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("sim_r")).toMap
    val kept = out.map(_.getAs[Long]("vec_id")).toSet
    val worstKept = sims.max
    assert(all.filterNot { case (id, _) => kept(id) }.values.forall(_ >= worstKept))
  }

  test("dimStats: dead and collapsed dimensions detected exactly") {
    val rows = Seq(
      (1L, Array(0.0f, 1.5f, 2.0f)),
      (2L, Array(0.0f, 1.5f, -3.0f)),
      (3L, Array(0.0f, 2.5f, 2.0f))
    ).toDF("vec_id", "embedding")
    val got = SimilarityOps.dimStats(rows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got(0L) == ((3L, 3L, 1L, 0.0, 0.0)))    // dead dim
    assert(got(1L) == ((3L, 0L, 2L, 1.5, 2.5)))    // partially collapsed
    assert(got(2L) == ((3L, 0L, 2L, -3.0, 2.0)))
  }

  test("semanticClusters: star labels equal the min-label reference over the semantic pair graph") {
    import org.apache.spark.sql.functions.col
    val cents = SimilarityOps.canonicalizeCentroids(graft.similarity.KMeans.trainCentroids(clustered, k = 4, iters = 2))
    // threshold low enough that the planted 5-vector blobs pair up
    val pairs = SimilarityOps.semanticDupPairs(clustered, cents, threshold = 0.2)
    assert(pairs.count() > 0, "fixture must produce semantic pairs")
    val labels = SimilarityOps.semanticClusters(clustered, cents, threshold = 0.2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every vector labeled; endpoints of every pair share a label
    assert(labels.size == clustered.count())
    for (r <- pairs.collect())
      assert(labels(r.getLong(1)) == labels(r.getLong(2)), s"split pair ${r.getLong(1)}-${r.getLong(2)}")
    // and the star loop's fixpoint equals the diameter-bound reference CC
    val ref = graft.dedup.DedupClusters.connectedComponents(
      clustered.select(col("vec_id").as("id")),
      pairs.select(col("vec_a").as("src"), col("vec_b").as("dst"))
    ).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == ref)
    // the cut: one min-id survivor per cluster, sizes partition the corpus
    val surv = SimilarityOps.semanticSurvivors(
      SimilarityOps.semanticClusters(clustered, cents, threshold = 0.2)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val byCluster = labels.groupBy(_._2)
    assert(surv.keySet == byCluster.keySet)
    for ((cid, (keep, size)) <- surv) {
      assert(keep == byCluster(cid).keys.min)
      assert(size == byCluster(cid).size.toLong)
    }
    assert(surv.values.map(_._2).sum == labels.size.toLong)
  }
}
