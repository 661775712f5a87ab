package graft.scale

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Partitioning strategies for the 100 TB design point — the three levers
  * that decide whether a plan survives a 1000-executor cluster:
  *
  *  1. '''Bucketing''' ([[writeBucketed]]) — persist fact tables bucketed on
  *     their join key; joins and aggregations over the bucket key then need
  *     NO exchange at all (the scan's output partitioning already satisfies
  *     the requirement). The single biggest shuffle eliminator for repeated
  *     joins over the same keys. PartitioningSpec asserts the no-Exchange
  *     plan shape.
  *  2. '''Salting''' ([[saltedCount]], [[saltKey]]) — when one key carries a
  *     disproportionate share of rows, hash-partitioning sends it all to one
  *     task. A deterministic row-content salt splits the hot key across
  *     `factor` partial groups; a second cheap aggregation merges the
  *     partials. (For sort-merge JOINs, prefer AQE's runtime skew-join
  *     splitting — spark.sql.adaptive.skewJoin — which needs no plan
  *     change; explicit salting is for aggregations and for joins AQE
  *     can't split.)
  *  3. '''Broadcast''' — used throughout the ops (`broadcast(q)` in
  *     similarity, dimension joins): ship the small side, never shuffle the
  *     big one.
  */
object Partitioning {

  /** Persist `df` bucketed (and sorted) by `key` into the session catalog.
    * Readers of `tableName` joining or aggregating on `key` skip the
    * exchange entirely.
    */
  def writeBucketed(df: DataFrame, tableName: String, key: String, numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)

  /** Deterministic salt in [0, factor): hash of the WHOLE row, so identical
    * join/group keys spread across salts whenever any other column differs
    * (a literal-random salt would break re-runs and oracle checks).
    */
  def saltKey(df: DataFrame, factor: Int): Column =
    pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(factor))

  /** Skew-safe count-by-key: partial count per (key, salt), then merge.
    * Identical result to `groupBy(key).count()`; the hot key's rows divide
    * across `factor` partial groups instead of one task.
    */
  def saltedCount(df: DataFrame, key: String, factor: Int = 16): DataFrame =
    df.withColumn("__salt", saltKey(df, factor))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("count"))

  /** Skew-safe inner equi-join: the FACT side gets the deterministic
    * row-content salt, the DIMENSION side is replicated once per salt value
    * (a `factor`-row broadcast), and the join keys become (key, salt) — a
    * hot key's rows land in `factor` tasks instead of one straggler.
    * Identical rows to `fact.join(dim, key)`. AQE's runtime skew splitting
    * (`spark.sql.adaptive.skewJoin`) is the first resort for sort-merge
    * joins; THIS is the explicit lever for the cases AQE can't split —
    * exchange-free bucketed inputs, stateful stream-stream joins, or a
    * replicable dimension side that is too big to broadcast whole but cheap
    * to duplicate `factor` times.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, factor: Int = 16): DataFrame = {
    val salted = fact.withColumn("__salt", saltKey(fact, factor))
    val salts = dim.sparkSession.range(factor).select(col("id").cast("int").as("__salt"))
    salted.join(dim.crossJoin(broadcast(salts)), Seq(key, "__salt")).drop("__salt")
  }
}
