package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.PageRank
import graft.dedup.DedupClusters
import graft.olap.Basket

/** Differential fuzz for the GRAPH operators — the family where a
  * partitioning, orientation, or fixpoint bug is least visible on friendly
  * data. Random hostile graphs (self-loops, duplicate edges, isolated nodes,
  * chains, edges pointing outside the node set, NULL endpoints) run through
  * the distributed operators and through independent in-JVM references:
  *
  *  - connected components (both the min-label loop and the large/small-star
  *    contraction) vs a plain union-find;
  *  - degree-oriented triangle counting vs the O(n³) closed form;
  *  - the integer PageRank loop vs a sequential exact-integer power
  *    iteration replaying the same floor-division mass split.
  *
  * The references share NO code with the operators (union-find vs label
  * propagation, triple-scan vs wedge join, per-edge loop vs shuffle rounds),
  * so agreement pins the distributed formulation, not the arithmetic alone.
  */
class GraphFuzzSpec extends AnyFunSuite {

  private val spark = SparkTestBase.spark
  import spark.implicits._

  // --- connected components ---------------------------------------------------

  private def unionFind(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      if (parent.contains(a) && parent.contains(b)) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    // min-id labeling: union-by-min above keeps every root the component min
    nodes.map(n => n -> find(n)).toMap
  }

  private def randomGraph(seed: Long): (Seq[Long], Seq[(Long, Long)]) = {
    val rnd = new scala.util.Random(seed)
    // sparse ids so labels aren't accidentally dense-contiguous
    val nodes = (0 until (5 + rnd.nextInt(36))).map(_ => rnd.nextInt(400).toLong).distinct
    val m     = rnd.nextInt(3 * nodes.size + 1)
    val edges = (0 until m).map { _ =>
      (nodes(rnd.nextInt(nodes.size)), nodes(rnd.nextInt(nodes.size))) // self-loops + dups included
    }
    (nodes, edges)
  }

  test("connected components: min-label and star contraction == union-find on random graphs") {
    val cases: Seq[(Seq[Long], Seq[(Long, Long)])] =
      (1L to 6L).map(randomGraph) :+ {
        // adversarial chain: diameter = |V| - 1, descending ids so the min
        // label must travel the full length against the edge orientation
        val ns = (0L to 24L).reverse
        (ns, ns.sliding(2).map(p => (p.head, p.last)).toSeq)
      }
    for (((ns, es), i) <- cases.zipWithIndex) {
      val expected = unionFind(ns, es).toSeq.sorted
      val nodesDf  = ns.toDF("id")
      val edgesDf  = es.toDF("src", "dst")
      val simple = DedupClusters.connectedComponents(nodesDf, edgesDf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      // default path: these graphs sit under MaxDriverEdges, so this
      // exercises the r19 bounded driver union-find fast path
      val star = DedupClusters.connectedComponentsStar(nodesDf, edgesDf)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      // maxDriverEdges = 0 forces the distributed star loop — both paths
      // must produce the identical min-label fixpoint
      val starLoop = DedupClusters.connectedComponentsStar(nodesDf, edgesDf, maxDriverEdges = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(simple == expected, s"case $i: min-label CC diverged from union-find")
      assert(star == expected, s"case $i: star CC (bounded path) diverged from union-find")
      assert(starLoop == expected, s"case $i: star CC (distributed loop) diverged from union-find")
    }
  }

  // --- triangle counting ------------------------------------------------------

  test("triangleCount: degree-oriented wedge join == cubic closed form on random baskets") {
    for (seed <- 1L to 6L) {
      val rnd     = new scala.util.Random(seed)
      val nOrders = 8 + rnd.nextInt(25)
      val rows = (0 until nOrders).flatMap { o =>
        val sz = 1 + rnd.nextInt(6) // includes 1-item orders (no pairs)
        (0 until sz).map(_ => (o.toLong, (1 + rnd.nextInt(12)).toLong)) // dup parts per order included
      }
      val li = rows.toDF("l_orderkey", "l_partkey")

      // reference: canonical pair counts -> thresholded edge set -> triple scan
      val minSupport = 2
      val pairCounts = rows.groupBy(_._1).toSeq
        .flatMap { case (_, rs) =>
          val parts = rs.map(_._2).distinct.sorted
          for (i <- parts.indices; j <- i + 1 until parts.size) yield (parts(i), parts(j))
        }
        .groupBy(identity).map { case (p, occ) => p -> occ.size }
      // toSeq first: collect-to-pairs on a Map would rebuild a Map and
      // collapse every edge sharing a first vertex
      val edgeSet = pairCounts.toSeq.collect { case ((a, b), c) if c >= minSupport => (a, b) }.toSet
      val vs      = edgeSet.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val expected = (for {
        i <- vs.indices; j <- i + 1 until vs.size; k <- j + 1 until vs.size
        if edgeSet((vs(i), vs(j))) && edgeSet((vs(i), vs(k))) && edgeSet((vs(j), vs(k)))
      } yield 1).size.toLong

      val got = Basket.triangleCount(li, minSupport).collect().head.getLong(0)
      assert(got == expected, s"seed $seed: triangles $got != reference $expected")
    }
  }

  // --- integer PageRank -------------------------------------------------------

  /** Sequential replay of pageRankGraph's declared integer semantics
    * (PageRank.scala:171): 10^12-scaled ranks, floor-division teleport, the
    * split-identity per-edge mass share, out-weights summed over ALL non-NULL-src
    * edges (a NULL-dst edge drains its share of the source's mass — the edge
    * is dropped but its weight stays in the denominator).
    */
  private def refPageRank(
      nodes: Seq[Long],
      edges: Seq[(Option[Long], Option[Long], Long)],
      iters: Int): Map[Long, Long] = {
    val Scale = 1000000000000L
    val ns    = nodes.distinct
    val n     = ns.size.toLong
    val teleport = (15L * Scale) / (100L * n)
    val outW = edges.collect { case (Some(s), _, w) => (s, w) }
      .groupBy(_._1).map { case (s, ws) => s -> ws.map(_._2).sum }
    var r = ns.map(_ -> Scale / n).toMap
    for (_ <- 1 to iters) {
      val cin = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((Some(s), Some(d), w) <- edges; rs <- r.get(s)) {
        val ow = outW(s)
        cin(d) += (rs / ow) * w + ((rs % ow) * w) / ow
      }
      r = ns.map(nd => nd -> (teleport + (85L * cin(nd)) / 100L)).toMap
    }
    r
  }

  test("pageRankGraph: distributed rank loop == sequential integer power iteration") {
    val schema = StructType(Seq(
      StructField("src", LongType, nullable = true),
      StructField("dst", LongType, nullable = true),
      StructField("w", LongType, nullable = false)
    ))
    for (seed <- 1L to 6L) {
      val rnd   = new scala.util.Random(seed)
      val nodes = (0 until (4 + rnd.nextInt(20))).map(_ => rnd.nextInt(100).toLong).distinct
      val m     = 1 + rnd.nextInt(4 * nodes.size)
      val edges = (0 until m).map { _ =>
        // NULL endpoints and out-of-node-set endpoints exercise the drop paths
        def endpoint(): Option[Long] = rnd.nextInt(12) match {
          case 0 => None
          case 1 => Some(1000L + rnd.nextInt(5)) // outside the node set
          case _ => Some(nodes(rnd.nextInt(nodes.size)))
        }
        (endpoint(), endpoint(), (1 + rnd.nextInt(5)).toLong)
      }
      val expected = refPageRank(nodes, edges, iters = 3)

      val edgesDf = spark.createDataFrame(
        spark.sparkContext.parallelize(
          edges.map { case (s, d, w) => Row(s.map(Long.box).orNull, d.map(Long.box).orNull, w) }, 3),
        schema)
      val nodesDf = nodes.toDF("node")
      val got = PageRank.pageRankGraph(spark, edgesDf, nodesDf, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed $seed: distributed ranks diverged from sequential replay")
    }
    PageRank.clearCache()
  }
}
