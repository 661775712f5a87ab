package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Static testdata-table catalog (TESTDATA.md / FIXTURES.md §B).
  *
  * Column lists are compile-time constants because the DuckDB oracle SQL
  * (graft.engine.OracleGen) is generated without a SparkSession; a ScalaTest
  * spec asserts they match the live parquet footers, so drift fails CI rather
  * than silently corrupting the oracle.
  */
object Tables {
  val columns: Map[String, Seq[String]] = Map(
    "region"   -> Seq("r_regionkey", "r_name"),
    "nation"   -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"     -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders" -> Seq(
      "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"
    ),
    "lineitem" -> Seq(
      "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice",
      "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"
    ),
    "events"     -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents"  -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label")
  )

  /** Round-robin a narrow input out to cluster width. A table that arrives
    * as fewer scan partitions than the cluster has cores (e.g. one parquet
    * row group — row-group granularity caps split-based parallelism no
    * matter what maxPartitionBytes says) would otherwise run any per-row
    * heavy operator on one core. The pre-work shuffle is a few MB and buys
    * full-width execution; wide inputs (any real at-scale table) pass
    * through untouched — no shuffle.
    *
    * The partition probe (`df.rdd.getNumPartitions`) forces physical
    * planning of the input on every call; it is memoized per semantically
    * equal plan so repeated operators over the same table (the normal
    * library usage) plan the scan once.
    */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val key    = (df.sparkSession, df.queryExecution.analyzed.semanticHash())
    if (widthCache.size > WidthCacheMax) widthCache.clear() // bound memory + session pinning
    val nParts = widthCache.getOrElseUpdate(key, df.rdd.getNumPartitions)
    if (nParts < target) df.repartition(target) else df
  }

  /** Memo is an optimization only: entries can go stale if the files behind
    * a path change mid-session (worst case the widen decision is off until
    * the cache cycles) and the 32-bit plan hash can in principle collide —
    * both bounded by the cap-and-clear policy. Callers needing an exact
    * decision for a just-rewritten path can `widthCacheClear()`.
    */
  private val WidthCacheMax = 1024
  private val widthCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, Int), Int]

  def widthCacheClear(): Unit = widthCache.clear()

  /** Columns whose DISTINCT count the oracle takes over the VARCHAR
    * rendering instead of the native value. Two cases:
    *   - MAP columns (events.props): Spark cannot hash/compare MapType in
    *     aggregates, so the stats pass distinct-counts the string rendering
    *     (StatsPass.distinctAggFor) and the oracle mirrors it — both sides
    *     count distinct renderings (injective for these fixtures).
    *   - ARRAY<FLOAT> columns (embeddings.embedding): Spark distinct-counts
    *     the native array; DuckDB's native list distinct would too, but the
    *     rendering form keeps the oracle SQL uniform, and since
    *     shortest-roundtrip float rendering is injective both counts equal
    *     the number of distinct arrays. Pattern counts are 0 on both sides
    *     (no anchored bank regex matches a bracketed vector rendering), so
    *     the whole profile row is engine-portable.
    */
  def mapColumns(table: String): Set[String] = table match {
    case "events"     => Set("props")
    case "embeddings" => Set("embedding")
    case _            => Set.empty
  }

  /** Tables whose profile is declared against the DuckDB oracle — all of
    * them, including `embeddings` since round 2 (see [[mapColumns]] for the
    * render-distinct treatment of its vector column).
    */
  val oracleProfiled: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events",
    "documents", "embeddings"
  )

  /** Load a testdata table.
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark cannot
    * represent (its TimestampType is microsecond). Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` so the scan succeeds; the
    * loader converts the nanos-long back to a microsecond timestamp
    * (exact integer division — testdata values are µs-aligned) so downstream
    * semantics (distinct counts, string rendering, windowing) agree with
    * engines that read the column natively.
    */
  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
    if (table == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    else df
  }
}
