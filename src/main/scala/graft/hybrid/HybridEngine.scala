package graft.hybrid

import org.apache.spark.sql.DataFrame

import graft.ai.AiClassifier
import graft.model._
import graft.pattern.PatternRules
import graft.stats.StatsPass

/** Hybrid classifier configuration (reference `HybridClassifier.__init__`,
  * `hybrid_classifier.py:31-63`).
  */
final case class HybridConfig(
    enableAi: Boolean = true,
    aiConfidenceThreshold: Double = 0.8,
    patternConfidenceThreshold: Double = 0.7
)

/** Counters mirroring `hybrid_stats` (`hybrid_classifier.py:55-61`). */
final case class HybridStats(
    patternOnly: Long = 0,
    aiEnhanced: Long = 0,
    aiOverride: Long = 0,
    consensusAgreement: Long = 0,
    consensusDisagreement: Long = 0
) {
  def total: Long = patternOnly + aiEnhanced + aiOverride + consensusAgreement
  def asMap: Map[String, Long] = Map(
    "pattern_only"           -> patternOnly,
    "ai_enhanced"            -> aiEnhanced,
    "ai_override"            -> aiOverride,
    "consensus_agreement"    -> consensusAgreement,
    "consensus_disagreement" -> consensusDisagreement
  )
}

/** Hybrid pattern+AI classification (reference: `HybridClassifier`,
  * `hybrid_classifier.py:20-284`).
  *
  * Pattern analysis always runs; AI runs only when enabled AND a non-noop
  * provider is wired (the reference additionally gates on the presence of
  * ANTHROPIC_API_KEY / GOOGLE_AI_API_KEY / OPENAI_API_KEY env vars,
  * `hybrid_classifier.py:65-87` — [[HybridEngine.envKeysPresent]] exposes
  * that check; the bundled [[graft.ai.HttpProvider]] adds its own stricter
  * gate — `GRAFT_AI_HTTP=1` AND per-vendor key AND endpoint AND model, all
  * required — so the zero-egress gate can never construct one).
  *
  * Merge semantics (`_merge_classifications`, `hybrid_classifier.py:148-199`)
  * are ported exactly, except PII merging uses ordinal severity max
  * (NONE < LOW < MEDIUM < HIGH) instead of the reference's alphabetical
  * string max under which "none" outranks "high" — the commented intent,
  * documented divergence (SURVEY.md §0.2(4)).
  */
final class HybridEngine(
    val config: HybridConfig = HybridConfig(),
    val ai: Option[AiClassifier] = None,
    statsConfig: StatsPass.Config = StatsPass.Config(withSamples = true, sampleK = 10)
) {

  // Atomic counters (not copy-on-write of an immutable snapshot): merge() may
  // be mapped over columns in parallel, and a read-copy-update of a @volatile
  // case class would lose increments under contention (ADVICE r1).
  import java.util.concurrent.atomic.AtomicLong
  private val nPatternOnly           = new AtomicLong
  private val nAiEnhanced            = new AtomicLong
  private val nAiOverride            = new AtomicLong
  private val nConsensusAgreement    = new AtomicLong
  private val nConsensusDisagreement = new AtomicLong

  @volatile private var aiEnabledFlag: Boolean =
    config.enableAi && ai.exists(_.hasProviders)

  def aiEnabled: Boolean = aiEnabledFlag
  def hybridStats: HybridStats = HybridStats(
    patternOnly = nPatternOnly.get,
    aiEnhanced = nAiEnhanced.get,
    aiOverride = nAiOverride.get,
    consensusAgreement = nConsensusAgreement.get,
    consensusDisagreement = nConsensusDisagreement.get
  )

  /** `set_ai_enabled` (`hybrid_classifier.py:276-284`): enabling without a
    * provider-backed classifier is refused.
    */
  def setAiEnabled(enabled: Boolean): Boolean = {
    if (enabled && !ai.exists(_.hasProviders)) false
    else { aiEnabledFlag = enabled; true }
  }

  /** `_merge_classifications` — pure given both inputs. */
  def merge(pattern: ColumnProfile, aiProfile: Option[ColumnProfile]): ColumnProfile =
    aiProfile match {
      case None =>
        nPatternOnly.incrementAndGet()
        val meaning =
          if (pattern.businessMeaning.nonEmpty) pattern.businessMeaning
          else s"Pattern-classified ${pattern.dataType.value}"
        pattern.copy(
          businessMeaning = meaning,
          dataQualityNotes = "Pattern-based classification only"
        )

      case Some(aiP) if aiP.dataType == pattern.dataType =>
        nConsensusAgreement.incrementAndGet()
        consensusProfile(pattern, aiP).copy(
          confidenceScore =
            math.min(0.95, (pattern.confidenceScore + aiP.confidenceScore) / 2 + 0.1),
          dataQualityNotes = "Pattern and AI consensus"
        )

      case Some(aiP) =>
        nConsensusDisagreement.incrementAndGet()
        if (aiP.confidenceScore >= config.aiConfidenceThreshold) {
          nAiOverride.incrementAndGet()
          enhanceWithAi(pattern, aiP, useAiClassification = true).copy(
            dataQualityNotes = f"AI override (confidence: ${aiP.confidenceScore}%.2f)"
          )
        } else if (pattern.confidenceScore >= config.patternConfidenceThreshold) {
          nAiEnhanced.incrementAndGet()
          enhanceWithAi(pattern, aiP, useAiClassification = false).copy(
            dataQualityNotes = "Pattern classification, AI enhanced"
          )
        } else {
          nAiEnhanced.incrementAndGet()
          enhanceWithAi(pattern, aiP, useAiClassification = false).copy(
            confidenceScore = (pattern.confidenceScore + aiP.confidenceScore) / 2,
            dataQualityNotes = "Hybrid result: pattern type, AI insights"
          )
        }
    }

  /** `_create_consensus_profile` (`hybrid_classifier.py:201-221`). */
  private def consensusProfile(p: ColumnProfile, a: ColumnProfile): ColumnProfile =
    p.copy(
      isPrimaryKey = p.isPrimaryKey || a.isPrimaryKey,
      isBusinessKey = p.isBusinessKey || a.isBusinessKey,
      piiLevel = Seq(p.piiLevel, a.piiLevel).max, // ordinal, not string max
      businessMeaning = if (a.businessMeaning.nonEmpty) a.businessMeaning else p.businessMeaning,
      suggestedImprovements = a.suggestedImprovements
    )

  /** `_enhance_with_ai` (`hybrid_classifier.py:223-245`). */
  private def enhanceWithAi(
      p: ColumnProfile,
      a: ColumnProfile,
      useAiClassification: Boolean
  ): ColumnProfile =
    p.copy(
      dataType = if (useAiClassification) a.dataType else p.dataType,
      isPrimaryKey = p.isPrimaryKey || a.isPrimaryKey,
      isBusinessKey = p.isBusinessKey || a.isBusinessKey,
      piiLevel = Seq(p.piiLevel, a.piiLevel).max,
      confidenceScore = if (useAiClassification) a.confidenceScore else p.confidenceScore,
      businessMeaning = if (a.businessMeaning.nonEmpty) a.businessMeaning else p.businessMeaning,
      dataQualityNotes = a.dataQualityNotes,
      suggestedImprovements = a.suggestedImprovements
    )

  /** `analyze_column` (`hybrid_classifier.py:89-110`) — the single-column
    * entry point (VERDICT r1 H2 gap): measure just that column (parquet
    * reads one column chunk), pattern-classify, optionally consult AI,
    * merge. Prefer [[analyzeDataFrame]] when profiling more than one column.
    */
  def analyzeColumn(df: DataFrame, columnName: String): ColumnProfile = {
    val one = df.select(df(s"`${columnName.replace("`", "``")}`"))
    profileOne(StatsPass.compute(one, statsConfig).head)
  }

  /** The per-column hybrid step shared by both entry points: pattern cascade,
    * optional AI consult, merge — one body, so the consultation rule cannot
    * drift between [[analyzeColumn]] and [[analyzeDataFrame]].
    */
  private def profileOne(s: graft.model.ColumnStats): ColumnProfile = {
    val patternProfile = PatternRules.profileColumn(s)
    val aiProfile =
      if (aiEnabledFlag)
        ai.flatMap(a => a.verdictFor(s).map { case (_, v) => a.profileFromVerdict(s, v) })
      else None
    merge(patternProfile, aiProfile)
  }

  /** `analyze_dataframe` (`hybrid_classifier.py:112-146`): one stats pass
    * feeds both the pattern cascade and the AI prompts.
    */
  def analyzeDataFrame(df: DataFrame): ClassificationResult = {
    val start = System.nanoTime()
    val allStats = StatsPass.compute(df, statsConfig)
    val profiles = allStats.map(profileOne)
    val elapsed = (System.nanoTime() - start) / 1e9
    ClassificationResult(
      columnProfiles = profiles,
      processingTime = elapsed,
      // faithful to the reference (`hybrid_classifier.py:133,138`): the
      // hybrid result reports the MODE ("hybrid"/"hybrid_ai" whenever AI is
      // enabled), not the contribution — even a run where every AI call
      // failed and all columns merged pattern-only says "hybrid_ai".
      // Per-column contribution lives in hybridStats (patternOnly == total
      // in that case) and AiClassifier.mostSuccessfulProvider reports the
      // provider that actually answered.
      aiProviderUsed = if (aiEnabledFlag) Some("hybrid") else None,
      classificationMethod = if (aiEnabledFlag) "hybrid_ai" else "hybrid_pattern_only",
      overallConfidence =
        if (profiles.nonEmpty) profiles.map(_.confidenceScore).sum / profiles.size else 0.0
    )
  }
}

object HybridEngine {

  /** The reference's env-var gate (`hybrid_classifier.py:69-74`). */
  def envKeysPresent(env: Map[String, String] = sys.env): Boolean =
    Seq("ANTHROPIC_API_KEY", "GOOGLE_AI_API_KEY", "OPENAI_API_KEY")
      .exists(k => env.get(k).exists(_.nonEmpty))

  /** `get_hybrid_stats` percentage breakdown (`hybrid_classifier.py:258-274`).
    *
    * Divergence (documented, §0.2-style): the reference sums
    * `hybrid_stats.values()` for the denominator, double-counting
    * disagreement columns (each consensus_disagreement also increments
    * ai_override or ai_enhanced), so its percentages never reach 100 on any
    * disagreeing run. The rebuild uses [[HybridStats.total]] — one count per
    * column processed (consensus_disagreement excluded as the non-exclusive
    * tally it is) — making total_processed equal the column count and the
    * exclusive-bucket percentages sum to ~100.
    */
  def statsWithPercentages(s: HybridStats): Map[String, Any] = {
    val total = s.total
    val base = Map[String, Any]("total_processed" -> total, "breakdown" -> s.asMap)
    if (total > 0)
      base + ("percentages" -> s.asMap.map { case (k, v) =>
        k -> math.round(v.toDouble / total * 1000.0) / 10.0
      })
    else base
  }
}
