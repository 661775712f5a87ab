package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** File ingestion surface (SURVEY.md §2 I1/I2; reference:
  * `tests/conftest.py:64-73` CSV round-trip + `.env.example`'s file-upload
  * ingestion path).
  *
  * Parquet is the primary format (columnar, predicate/projection pushdown —
  * `.explain` shows PushedFilters/ReadSchema reaching the scan). CSV is the
  * ingestion-edge format: schema-explicit by default because inference costs
  * an extra full scan of the input — at 100 TB you pass the schema.
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV reader. `schema=None` infers (extra scan — small inputs only);
    * header defaults on, matching the pandas `to_csv/read_csv` round-trip
    * semantics of the reference fixture.
    *
    * `multiLine=false` (the default) keeps the read SPLITTABLE — at 100 TB
    * each file splits into line-boundary partitions. A value containing an
    * embedded newline is only parseable with `multiLine=true`, which forces
    * one task per file: that is the CSV format's trade-off, not this
    * reader's — [[csvRoundTrip]] passes it so the identity contract holds
    * on any text, and pipelines with newline-bearing text should interchange
    * via JSONL/parquet instead.
    */
  def readCsv(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None,
      header: Boolean = true,
      multiLine: Boolean = false,
      nullValue: String = ""
  ): DataFrame = {
    val base = spark.read
      .option("header", header.toString)
      .option("nullValue", nullValue)
      .option("multiLine", multiLine.toString)
    schema match {
      case Some(s) => base.schema(s).csv(path)
      case None    => base.option("inferSchema", "true").csv(path)
    }
  }

  /** CSV writer. The writer's whitespace-trim options default ON in Spark —
    * they would silently rewrite " hello " as "hello" and break the
    * round-trip identity — so they are pinned off: what goes in comes out.
    */
  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
               nullValue: String = ""): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString)
      .option("nullValue", nullValue)
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)

  def writeParquet(df: DataFrame, path: String): Unit = {
    df.write.mode(SaveMode.Overwrite).parquet(path)
    // an overwrite can change the partition count behind any plan that scans
    // this path — drop the widen memo so the next probe sees fresh files
    graft.Tables.widthCacheClear()
  }

  /** JSON-lines reader — the lingua franca of LLM training-data interchange
    * (one JSON object per line, splittable, append-friendly). Schema-explicit
    * by default for the same reason as CSV; inference scans the input once.
    * Malformed lines land in the PERMISSIVE-mode `_corrupt_record` column
    * when the schema declares one — at pipeline scale you quarantine those,
    * not crash on them.
    */
  def readJsonl(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None
  ): DataFrame = {
    val base = spark.read.option("mode", "PERMISSIVE")
    schema match {
      case Some(s) => base.schema(s).json(path)
      case None    => base.json(path)
    }
  }

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** How a JDBC read is spread over concurrent connections: Spark issues one
    * `WHERE column BETWEEN …` slice per partition. Without this, a JDBC scan
    * is ONE connection pulling the whole table through the driver-side
    * bottleneck — fine for dimension tables, fatal for facts.
    */
  final case class JdbcPartitioning(
      column: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int
  )

  /** Database ingestion — the Spark-native closing of the reference's
    * declared-but-empty `database/` package (SQLAlchemy + asyncpg deps with
    * zero implementation, `pyproject.toml:24-25`). Driver class loading is
    * the caller's concern via `properties("driver")` when the URL scheme
    * doesn't auto-register (embedded Derby, used by the spec, does).
    */
  def readJdbc(
      spark: SparkSession,
      url: String,
      table: String,
      properties: Map[String, String] = Map.empty,
      partitioning: Option[JdbcPartitioning] = None
  ): DataFrame = {
    val props = new java.util.Properties()
    properties.foreach { case (k, v) => props.setProperty(k, v) }
    partitioning match {
      case Some(p) =>
        spark.read.jdbc(url, table, p.column, p.lowerBound, p.upperBound, p.numPartitions, props)
      case None =>
        spark.read.jdbc(url, table, props)
    }
  }

  def writeJdbc(
      df: DataFrame,
      url: String,
      table: String,
      properties: Map[String, String] = Map.empty,
      mode: SaveMode = SaveMode.ErrorIfExists
  ): Unit = {
    val props = new java.util.Properties()
    properties.foreach { case (k, v) => props.setProperty(k, v) }
    df.write.mode(mode).jdbc(url, table, props)
  }

  /** Full JSONL round-trip: write `df` as JSON lines, read it back with the
    * SAME explicit schema. Declared as a query (`jsonl_roundtrip_documents`)
    * whose oracle is the identity over the source parquet — so the JSON
    * writer/reader pair (escaping, nulls, numeric types) is hash-checked
    * end-to-end, not just spec-tested (r3 verdict missing #2).
    */
  def jsonlRoundTrip(df: DataFrame, path: String, orderCol: String): DataFrame = {
    writeJsonl(df, path)
    readJsonl(df.sparkSession, path, Some(df.schema)).orderBy(orderCol)
  }

  /** ORC — the other columnar format a lakehouse migration hands this engine
    * (Hive-era warehouses are predominantly ORC). Spark's native reader gives
    * it the same predicate/projection pushdown as parquet.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** ORC round-trip under the hash gate, same contract as [[jsonlRoundTrip]]:
    * the oracle is the identity over the source parquet, so the ORC
    * writer/reader pair is checked end-to-end.
    */
  def orcRoundTrip(df: DataFrame, path: String, orderCol: String): DataFrame = {
    writeOrc(df, path)
    readOrc(df.sparkSession, path).orderBy(orderCol)
  }

  /** CSV round-trip under the hash gate, same contract as
    * [[jsonlRoundTrip]]: written with Spark's quoting/escaping, read back
    * with the SOURCE schema declared (the interchange-format contract —
    * schema travels out-of-band; inference is for exploration, not
    * pipelines). Puts the quoting round-trip itself under the hash check.
    */
  /** The null marker the round-trip reserves: with the default empty-string
    * marker, NULL and '' both render as an empty field and the reader
    * collapses both to NULL — the r11 adversarial sweep caught '' coming
    * back as NULL. The `\N` sentinel (the classic COPY convention) keeps
    * them distinct; the trade-off is that a field whose VALUE is the
    * two-char string `\N` reads back as NULL — corpora carrying that
    * literal should interchange via JSONL/parquet.
    */
  val CsvNullMarker = "\\N"

  def csvRoundTrip(df: DataFrame, path: String, orderCol: String): DataFrame = {
    writeCsv(df, path, nullValue = CsvNullMarker)
    // multiLine: embedded newlines are quoted on write and must be parsed as
    // one record on read — without it the reader splits them into malformed
    // extra rows (identity broken the first time the corpus contains one)
    readCsv(df.sparkSession, path, Some(df.schema), multiLine = true,
      nullValue = CsvNullMarker).orderBy(orderCol)
  }

  /** Schema-evolution round-trip: batch 1 is written WITHOUT `dropCol`
    * (yesterday's producer), batch 2 with it (today's), and the read
    * reconciles both under `mergeSchema` — old rows surface the new column
    * as NULL, by name, no rewrite of the old files. This is the normal
    * state of a long-lived corpus: schemas drift batch to batch, and the
    * engine must read the union without a migration.
    *
    * Scale note: `mergeSchema` reconciles by reading every file's footer —
    * fine per-batch, wasteful as the standing contract at 10⁶ files; a
    * production table keeps ONE declared current schema (the
    * [[csvRoundTrip]] doctrine) and uses this reconciliation at
    * schema-change boundaries. The semantics proven here (by-name merge,
    * NULL backfill) are what that declared schema evolves under.
    */
  def mergeSchemaRoundTrip(
      df: DataFrame, path: String, dropCol: String, orderCol: String): DataFrame = {
    val spark = df.sparkSession
    df.drop(dropCol).withColumn("batch", lit(1L))
      .write.mode("overwrite").parquet(s"$path/b1")
    df.withColumn("batch", lit(2L))
      .write.mode("overwrite").parquet(s"$path/b2")
    spark.read.option("mergeSchema", "true").parquet(s"$path/b1", s"$path/b2")
      .select((df.columns.map(col) :+ col("batch")).toSeq: _*)
      .orderBy(orderCol, "batch")
  }

  /** Hive-style partitioned layout: write `df` partitioned by
    * `partitionCol` (one directory per value), read it back with an
    * equality filter on that column. The filter is satisfied by PARTITION
    * PRUNING — directory listing, zero data files of other partitions
    * opened — the mechanism that turns a 100 TB scan into a 1-partition
    * scan when queries filter on the layout key. R10dOpsSpec asserts the
    * pruned plan (`PartitionFilters` carries the predicate; non-matching
    * partitions never reach the scan's file listing).
    *
    * Declared form: documents partitioned by `lang`, read back at one
    * language, identity-oracled against `WHERE lang = ...` on the source
    * table. Column order is restored to the canonical table order
    * (partitioned writes move the partition column to the directory level;
    * the read appends it last).
    */
  def partitionedRoundTrip(
      df: DataFrame,
      path: String,
      partitionCol: String,
      value: String,
      orderCol: String
  ): DataFrame = {
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
    graft.Tables.widthCacheClear()
    // schema pinned from the input: an empty write leaves no partition dirs
    // and schema inference would fail (UNABLE_TO_INFER_SCHEMA) — the
    // round-trip of an empty slice is an empty frame, not a crash
    df.sparkSession.read.schema(df.schema).parquet(path)
      .where(col(partitionCol) === value)
      .select(df.columns.toIndexedSeq.map(col): _*)
      .orderBy(orderCol)
  }
}
