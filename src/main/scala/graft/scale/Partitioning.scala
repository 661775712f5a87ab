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

  /** Key-skew diagnostics — the measurement that DECIDES between the levers
    * above: per-key row counts summarized as one row of exact longs (total
    * rows, distinct keys, the heaviest key's rows, the top-`topK` keys'
    * combined rows) plus the derived shares. `max_share_r` ≈ 1/|keys| means
    * hash partitioning is safe; a `top_share_r` concentrated in a handful of
    * keys at 100 TB means the shuffle on this key needs salting or AQE skew
    * handling BEFORE it becomes the straggler. This is run-it-first
    * tooling, not an afterthought: the counts frame is one
    * map-side-combinable exchange over the key, the summary is a 1-row
    * aggregate, and the top-K probe is a bounded TakeOrdered head (per-
    * partition heaps, driver merge of P·topK rows — never a global sort).
    */
  def keySkew(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n")).persist()
    val totals = counts.agg(
      sum(col("n")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("n")).as("max_key_rows")
    )
    val top = counts
      .orderBy(col("n").desc, col(key))
      .limit(topK)
      .agg(sum(col("n")).as("top_rows"))
    totals
      .crossJoin(broadcast(top))
      .select(
        col("n_rows"),
        col("n_keys"),
        col("max_key_rows"),
        col("top_rows"),
        round(col("max_key_rows").cast("double") / col("n_rows"), 6).as("max_share_r"),
        round(col("top_rows").cast("double") / col("n_rows"), 6).as("top_share_r")
      )
  }

  /** DuckDB twin of [[keySkew]] over `table`.`key` — same counts, same
    * (n DESC, key) top-K total order, same rounded shares.
    */
  def oracleKeySkew(table: String, key: String, topK: Int = 10): String =
    s"""WITH counts AS (SELECT $key AS k, count(*) AS n FROM $table GROUP BY 1),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_keys,
       |               CAST(max(n) AS BIGINT) AS max_key_rows FROM counts),
       |top AS (SELECT CAST(sum(n) AS BIGINT) AS top_rows FROM (
       |  SELECT n FROM counts ORDER BY n DESC, k LIMIT $topK))
       |SELECT n_rows, n_keys, max_key_rows, top_rows,
       |  round(CAST(max_key_rows AS DOUBLE) / n_rows, 6) AS max_share_r,
       |  round(CAST(top_rows AS DOUBLE) / n_rows, 6) AS top_share_r
       |FROM tot, top""".stripMargin
}
