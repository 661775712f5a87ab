package graft.ai

import org.apache.spark.sql.DataFrame

import graft.model._
import graft.pattern.PatternRules
import graft.stats.StatsPass

/** Multi-provider AI classifier (reference: `MultiAIClassifier`,
  * `ai_classifier.py:26-221`).
  *
  * Providers are tried in priority order; the first parseable verdict wins
  * (`_get_ai_analysis`, `ai_classifier.py:116-135`). All providers failing
  * falls back to a heuristic profile with confidence exactly 0.5
  * (`_create_basic_profile` — missing from the truncated snapshot; spec from
  * `tests/unit/test_classifiers.py:178-185`).
  *
  * The Spark inversion: one [[graft.stats.StatsPass]] job measures every
  * column (including prompt sample values), then the per-column provider
  * calls happen driver-side over the collected stats rows — the distributed
  * plan never blocks on network I/O, and the AI path adds zero Spark jobs.
  */
final class AiClassifier(
    providers: Seq[AiProvider] = Seq(NoopProvider),
    statsConfig: StatsPass.Config = StatsPass.Config(withSamples = true, sampleK = 10)
) {

  // AtomicLong per provider (not read-copy-update of an immutable map): the
  // per-column path may be mapped over columns in parallel (same reasoning as
  // HybridEngine's counters, ADVICE r1) and a lost increment would misreport
  // mostSuccessfulProvider
  private val providerSuccesses: Map[String, java.util.concurrent.atomic.AtomicLong] =
    providers.map(_.name -> new java.util.concurrent.atomic.AtomicLong).toMap

  def hasProviders: Boolean = providers.exists(_ != NoopProvider)

  /** Provider fallback chain for one column (A2). */
  def verdictFor(stats: ColumnStats): Option[(String, AiVerdict)] = {
    val prompt = AiPrompt.create(stats.name, stats.sampleValues, stats)
    providers.iterator.flatMap { p =>
      p.complete(prompt).flatMap(AiResponseParser.parse).map { v =>
        providerSuccesses(p.name).incrementAndGet()
        (p.name, v)
      }
    }.nextOption()
  }

  /** `_create_profile_from_ai` (spec: `ai_classifier.py:69-70`,
    * `tests/unit/test_classifiers.py:156-176`): map the verdict onto a
    * profile, stats from the measurement pass, confidence from the verdict
    * (default 0.7).
    */
  def profileFromVerdict(stats: ColumnStats, v: AiVerdict): ColumnProfile =
    ColumnProfile(
      originalName = stats.name,
      suggestedName = PatternRules.suggestedName(stats.name),
      dataType = v.dataType,
      isPrimaryKey = v.isPrimaryKey,
      isBusinessKey = v.isBusinessKey,
      piiLevel = v.piiLevel,
      uniqueRatio = stats.uniqueRatio,
      nullRatio = stats.nullRatio,
      sampleValues = stats.sampleValues.take(5),
      confidenceScore = v.confidenceScore,
      businessMeaning = v.businessMeaning,
      dataQualityNotes = v.dataQualityNotes,
      suggestedImprovements = v.suggestedImprovements,
      totalRows = stats.totalRows,
      uniqueCount = stats.uniqueCount,
      nullCount = stats.nullCount
    )

  /** `_create_basic_profile` (spec: confidence exactly 0.5, non-empty
    * business_meaning, `tests/unit/test_classifiers.py:178-185`): the pattern
    * profile builder reused at reduced confidence.
    */
  def basicProfile(stats: ColumnStats): ColumnProfile =
    PatternRules.profileColumn(stats).copy(confidenceScore = 0.5)

  def analyzeStats(stats: ColumnStats): ColumnProfile =
    verdictFor(stats) match {
      case Some((_, v)) => profileFromVerdict(stats, v)
      case None         => basicProfile(stats)
    }

  /** `_get_most_successful_provider` (spec from `ai_classifier.py:103,108`).
    * Ties break by the configured provider priority order (deterministic —
    * a Map's iteration order is not).
    */
  def mostSuccessfulProvider: Option[String] = {
    val counts = providers.map(p => p.name -> providerSuccesses(p.name).get())
    val best = counts.maxByOption(_._2).map(_._2).getOrElse(0L)
    if (best <= 0L) None else counts.collectFirst { case (n, c) if c == best => n }
  }

  /** `analyze_dataframe` (AI path, `ai_classifier.py:78-114`). */
  def analyzeDataFrame(df: DataFrame): ClassificationResult = {
    val start = System.nanoTime()
    val allStats = StatsPass.compute(df, statsConfig)
    val profiles = allStats.map(analyzeStats)
    val elapsed = (System.nanoTime() - start) / 1e9
    ClassificationResult(
      columnProfiles = profiles,
      processingTime = elapsed,
      aiProviderUsed = mostSuccessfulProvider,
      classificationMethod = "ai_powered",
      overallConfidence =
        if (profiles.nonEmpty) profiles.map(_.confidenceScore).sum / profiles.size else 0.0
    )
  }
}
