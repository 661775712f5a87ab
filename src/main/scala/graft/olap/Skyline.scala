package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) query — "the parts no other part beats on both
  * price and size": minimize `p_retailprice`, maximize `p_size`. The classic
  * multi-criteria shortlist an analyst runs over a catalog (reference
  * intent: the profiler's numeric summaries feed exactly this kind of
  * trade-off query; see `/root/reference` dashboards' top-N views).
  *
  * Naive skyline is the quadratic NOT-EXISTS self-join (the oracle's
  * definition). The distributed plan here is the sort-filter-skyline:
  *
  *   1. project + distinct the criterion pairs — one map-side-combined
  *      shuffle whose output is |distinct pairs|, not |rows|;
  *   2. LOCAL prune: sort each partition by (price asc, size desc) and keep
  *      a pair only when its size strictly exceeds the partition's running
  *      max — a dropped pair is witnessed by an in-partition dominator, and
  *      dominance is transitive, so no frontier point is ever dropped. This
  *      is per-partition imperative logic (running max), done in one
  *      `mapPartitions` pass with NO shuffle; each partition reduces to its
  *      local frontier (a price-up size-up staircase, in practice tiny);
  *   3. GLOBAL pass: the same running-max filter over the union of local
  *      frontiers in one ordered window — bounded by Σ|local frontiers|,
  *      which is what makes the single-partition window safe at 100 TB
  *      (step 2 already collapsed the data; the window never sees raw rows);
  *   4. broadcast the frontier pairs back onto the base table to emit full
  *      rows (duplicate criterion pairs all surface).
  *
  * Ties: equal (price, size) pairs are one distinct pair — neither dominates
  * the other (dominance needs one strict inequality) — so all rows carrying
  * a frontier pair are in the skyline.
  */
object Skyline {

  /** Skyline of `df` minimizing `minCol` (double) and maximizing `maxCol`
    * (integral), emitting `keyCols ++ (minCol, maxCol)` deterministically
    * ordered. Criterion values pass through untouched (no arithmetic), so
    * the driver's value hash matches the oracle bit-for-bit.
    */
  def skyline(df: DataFrame, minCol: String, maxCol: String, keyCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val base = graft.Tables.widen(df)
      .where(col(minCol).isNotNull && col(maxCol).isNotNull)

    val pairs = base
      .select(col(minCol).cast("double").as("__price"), col(maxCol).cast("long").as("__size"))
      .distinct()

    // step 2: in-partition running-max prune (sort is partition-local)
    val localFrontier = pairs
      .as[(Double, Long)]
      .sortWithinPartitions(col("__price").asc, col("__size").desc)
      .mapPartitions { it =>
        var best = Long.MinValue
        it.filter { case (_, size) =>
          if (size > best) { best = size; true } else false
        }
      }
      .toDF("__price", "__size")

    // step 3: global running-max over the pruned union (strictly-preceding
    // frame: a pair is dominated iff an earlier pair in (price asc, size
    // desc) order has size >= its own)
    val w = Window
      .orderBy(col("__price").asc, col("__size").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = localFrontier
      .withColumn("__m", max(col("__size")).over(w))
      .where(col("__m").isNull || col("__size") > col("__m"))
      .select("__price", "__size")

    base
      .join(
        broadcast(frontier),
        col(minCol).cast("double") === col("__price") &&
          col(maxCol).cast("long") === col("__size")
      )
      .select((keyCols ++ Seq(minCol, maxCol)).map(col): _*)
      .orderBy(col(minCol).asc, col(maxCol).asc, col(keyCols.head).asc)
  }

  /** DuckDB twin: the textbook NOT-EXISTS dominance definition — an
    * independent formulation, so a hash match is evidence the distributed
    * sort-filter plan computes the same frontier.
    */
  def oracleSkylinePart: String =
    """SELECT p_partkey, p_retailprice, p_size
      |FROM part a
      |WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL AND NOT EXISTS (
      |  SELECT 1 FROM part b
      |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size >= a.p_size
      |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))
      |ORDER BY p_retailprice, p_size, p_partkey""".stripMargin
}
