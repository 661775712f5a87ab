package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model._
import graft.pattern.PatternRules
import graft.stats.StatsPass

/** Flat, DataFrame-friendly rendering of a [[graft.model.ColumnProfile]].
  *
  * Field names are snake_case because they are the declared oracle contract:
  * the driver hash-compares Spark parquet output against DuckDB SQL output
  * column-by-column after sorting columns by name, so these names appear
  * verbatim in `graft.engine.OracleGen`'s generated SQL.
  *
  * Deliberately excluded (reported elsewhere, never hashed): sample_values
  * (ordering is engine-specific, SURVEY.md §2.1 S3), processing_time,
  * data_quality_notes / suggested_improvements (AI-path fields, empty here).
  */
final case class ProfileRow(
    column_name: String,
    suggested_name: String,
    data_type: String,
    is_primary_key: Boolean,
    is_business_key: Boolean,
    pii_level: String,
    total_rows: Long,
    null_count: Long,
    unique_count: Long,
    null_ratio: Double,
    unique_ratio: Double,
    confidence_score: Double,
    business_meaning: String
)

/** The pattern-based profiling engine (reference: `PatternClassifier`,
  * `pattern_classifier.py:18-137`, rebuilt per SURVEY.md §3.3/§4.3).
  *
  * One Spark job measures all columns ([[graft.stats.StatsPass]]); the
  * decision cascade ([[graft.pattern.PatternRules]]) then runs driver-side on
  * a single collected stats row per table. Driver work is O(columns), never
  * O(rows).
  */
class ProfilerEngine(val statsConfig: StatsPass.Config = StatsPass.Config()) {

  @volatile private var totalColumnsAnalyzed: Long = 0L
  @volatile private var successfulClassifications: Long = 0L
  @volatile private var failedClassifications: Long = 0L

  /** Mutable counters mirroring `BaseClassifier.classification_stats`
    * (`base.py:115-119`).
    */
  def classificationStats: Map[String, Long] = Map(
    "total_columns_analyzed"     -> totalColumnsAnalyzed,
    "successful_classifications" -> successfulClassifications,
    "failed_classifications"     -> failedClassifications
  )

  /** Measure all columns in one pass. */
  def computeStats(df: DataFrame): Seq[ColumnStats] = StatsPass.compute(df, statsConfig)

  /** `PatternClassifier.analyze_dataframe` (`pattern_classifier.py:110-137`):
    * profile every column, isolate failures, constant 0.8 confidence,
    * method = "pattern_based".
    */
  def analyzeDataFrame(df: DataFrame): ClassificationResult = {
    val start = System.nanoTime()
    val stats = computeStats(df)
    val profiles = stats.map(PatternRules.profileColumn)
    val elapsed = (System.nanoTime() - start) / 1e9
    totalColumnsAnalyzed += df.columns.length
    successfulClassifications += profiles.size
    failedClassifications += (df.columns.length - profiles.size)
    ClassificationResult(
      columnProfiles = profiles,
      processingTime = elapsed,
      aiProviderUsed = None,
      classificationMethod = "pattern_based",
      overallConfidence = PatternRules.PatternConfidence
    )
  }

  /** Profile one named column (`analyze_column`,
    * `pattern_classifier.py:64-108`). Prefer [[analyzeDataFrame]] — this still
    * scans the table (projected to one column, so parquet reads one column
    * chunk).
    */
  def analyzeColumn(df: DataFrame, columnName: String): ColumnProfile = {
    val one = df.select(df(s"`${columnName.replace("`", "``")}`"))
    val stats = StatsPass.compute(one, statsConfig)
    PatternRules.profileColumn(stats.head)
  }

  /** Profile table as a DataFrame with the declared oracle schema, ordered by
    * column_name (deterministic row order for hashing).
    */
  def profileDF(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    val rows = analyzeDataFrame(df).columnProfiles.map(ProfilerEngine.toRow)
    spark.createDataset(rows).toDF().orderBy("column_name")
  }

  /** Q-SUMMARY: data_type breakdown of a profile (S4, `base.py:82-106`). */
  def summaryDF(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    val profiles = analyzeDataFrame(df).columnProfiles
    val rows = profiles
      .groupBy(_.dataType.value)
      .map { case (dt, ps) => (dt, ps.size.toLong) }
      .toSeq
      .sortBy(_._1)
    spark.createDataset(rows).toDF("data_type", "n_columns").orderBy("data_type")
  }
}

object ProfilerEngine {
  def toRow(p: ColumnProfile): ProfileRow = ProfileRow(
    column_name = p.originalName,
    suggested_name = p.suggestedName,
    data_type = p.dataType.value,
    is_primary_key = p.isPrimaryKey,
    is_business_key = p.isBusinessKey,
    pii_level = p.piiLevel.value,
    total_rows = p.totalRows,
    null_count = p.nullCount,
    unique_count = p.uniqueCount,
    null_ratio = p.nullRatio,
    unique_ratio = p.uniqueRatio,
    confidence_score = p.confidenceScore,
    business_meaning = p.businessMeaning
  )
}
