package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.{OracleGen, ProfilerEngine}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names to (spark, sfDir) => DataFrame; `oracleSql`
  * carries the equivalent DuckDB SQL over the same parquet tables. Column
  * names and row ordering match on both sides (the driver sorts columns by
  * name before hashing, rows are ordered identically by explicit ORDER BY /
  * orderBy on both sides).
  */
object SparkEntry {

  private def engine = new ProfilerEngine()

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * full pattern-profile of the largest table.
    */
  def entry(spark: SparkSession): DataFrame =
    engine.profileDF(spark, Tables.load(spark, "/root/testdata/sf0.001", "lineitem"))

  // --- query builders -------------------------------------------------------

  private def profileQuery(table: String)(spark: SparkSession, dir: String): DataFrame =
    engine.profileDF(spark, Tables.load(spark, dir, table))

  private def summaryQuery(table: String)(spark: SparkSession, dir: String): DataFrame =
    engine.summaryDF(spark, Tables.load(spark, dir, table))

  private def statsQuery(table: String)(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    profileQuery(table)(spark, dir).select(
      col("column_name"), col("total_rows"), col("null_count"), col("unique_count"),
      col("null_ratio"), col("unique_ratio")
    ).orderBy("column_name")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val profiles = (Tables.oracleProfiled :+ "embeddings").map { t =>
      s"profile_$t" -> (profileQuery(t) _)
    }
    val summaries = Seq("lineitem", "customer", "events").map { t =>
      s"summary_$t" -> (summaryQuery(t) _)
    }
    val stats = Seq("lineitem", "customer").map { t =>
      s"stats_$t" -> (statsQuery(t) _)
    }
    (profiles ++ summaries ++ stats).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted for non-SQL-expressible ops (driver records
    * a weaker rows-only check).
    */
  def oracleSql: Map[String, String] = {
    val profiles = Tables.oracleProfiled.map { t =>
      s"profile_$t" -> OracleGen.profileSql(t, Tables.columns(t))
    }
    val summaries = Seq("lineitem", "customer", "events").map { t =>
      s"summary_$t" -> OracleGen.summarySql(t, Tables.columns(t))
    }
    val stats = Seq("lineitem", "customer").map { t =>
      s"stats_$t" -> OracleGen.statsSql(t, Tables.columns(t))
    }
    (profiles ++ summaries ++ stats).toMap
  }
}
