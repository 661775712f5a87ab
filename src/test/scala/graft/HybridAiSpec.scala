package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ai._
import graft.hybrid.{HybridConfig, HybridEngine, HybridStats}
import graft.model._
import graft.pattern.PatternRules

/** Port of the reference AI/hybrid unit suite
  * (`tests/unit/test_classifiers.py:125-304` — TestMultiAIClassifier,
  * TestHybridClassifier, TestClassifierIntegration) onto the zero-egress
  * provider architecture: ScriptedProvider stands in for the reference's
  * mocked HTTP clients.
  */
class HybridAiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def mkStats(name: String, total: Long = 10, nn: Long = 10, uniq: Long = 10) =
    ColumnStats(name, total, nn, uniq, Map.empty, Seq("a", "b"))

  private def mkProfile(
      name: String,
      dt: SemanticType,
      conf: Double,
      pii: PiiLevel = PiiLevel.None,
      meaning: String = ""
  ) = ColumnProfile(
    originalName = name,
    suggestedName = name,
    dataType = dt,
    piiLevel = pii,
    confidenceScore = conf,
    businessMeaning = meaning
  )

  // --- A5: _parse_ai_response (test_classifiers.py:187-213) -----------------

  test("A5 parse: plain JSON verdict") {
    val v = AiResponseParser.parse(
      """{"data_type": "email", "is_primary_key": false, "is_business_key": false, "pii_level": "high", "confidence_score": 0.9}"""
    )
    assert(v.isDefined)
    assert(v.get.dataType == SemanticType.Email)
    assert(v.get.piiLevel == PiiLevel.High)
    assert(v.get.confidenceScore == 0.9)
  }

  test("A5 parse: ```json fenced verdict") {
    val v = AiResponseParser.parse(
      "```json\n{\"data_type\": \"text\", \"is_primary_key\": false, \"is_business_key\": true, \"pii_level\": \"none\", \"confidence_score\": 0.8}\n```"
    )
    assert(v.isDefined)
    assert(v.get.dataType == SemanticType.Text)
    assert(v.get.isBusinessKey)
    assert(v.get.confidenceScore == 0.8)
  }

  test("A5 parse: bare ``` fenced verdict") {
    val v = AiResponseParser.parse(
      "```\n{\"data_type\": \"identifier\", \"is_primary_key\": true, \"is_business_key\": false, \"pii_level\": \"none\", \"confidence_score\": 0.95}\n```"
    )
    assert(v.isDefined)
    assert(v.get.dataType == SemanticType.Identifier)
    assert(v.get.isPrimaryKey)
    assert(v.get.confidenceScore == 0.95)
  }

  test("A5 parse: invalid inputs return None (test_invalid_json_handling)") {
    assert(AiResponseParser.parse("This is not JSON").isEmpty)
    assert(AiResponseParser.parse("""{"incomplete": "json""").isEmpty)
    // unknown data_type vocabulary value → unparseable verdict
    assert(
      AiResponseParser
        .parse("""{"data_type": "invalid_type", "confidence_score": "not_a_number"}""")
        .isEmpty
    )
  }

  // --- A2/A7/A8: provider chain + fallback (test_classifiers.py:148-185) ----

  private val emailVerdictJson =
    """{"data_type": "email", "is_primary_key": false, "is_business_key": false, "pii_level": "high", "confidence_score": 0.9, "business_meaning": "Customer email address"}"""

  test("A2 provider fallback chain: first failing provider is skipped") {
    val dead  = new ScriptedProvider("dead", _ => None)
    val garbled = new ScriptedProvider("garbled", _ => Some("not json at all"))
    val live  = new ScriptedProvider("live", _ => Some(emailVerdictJson))
    val ai = new AiClassifier(Seq(dead, garbled, live))
    val got = ai.verdictFor(mkStats("email"))
    assert(got.isDefined)
    assert(got.get._1 == "live")
    assert(got.get._2.dataType == SemanticType.Email)
    assert(ai.mostSuccessfulProvider.contains("live"))
  }

  test("A4/A6 scripted verdict maps onto a full profile (test_claude_api_call)") {
    val live = new ScriptedProvider("claude-ish", _ => Some(emailVerdictJson))
    val ai   = new AiClassifier(Seq(live))
    val p    = ai.analyzeStats(mkStats("email"))
    assert(p.dataType == SemanticType.Email)
    assert(p.piiLevel == PiiLevel.High)
    assert(p.confidenceScore == 0.9)
    assert(p.businessMeaning == "Customer email address")
  }

  test("A7 all-providers-fail falls back to basic profile at confidence exactly 0.5") {
    val ai = new AiClassifier(Seq(NoopProvider))
    val p  = ai.analyzeStats(mkStats("email"))
    assert(p.confidenceScore == 0.5) // test_classifiers.py:184
    assert(p.businessMeaning.nonEmpty)
  }

  test("A1 initialization without providers: not AI-enabled (test_initialization_without_keys)") {
    val ai = new AiClassifier(Seq(NoopProvider))
    assert(!ai.hasProviders)
    assert(ai.mostSuccessfulProvider.isEmpty)
  }

  test("A3 prompt carries the column evidence") {
    val s = ColumnStats("email", 100, 90, 80, Map.empty, Seq("a@b.com", "c@d.org"))
    val prompt = AiPrompt.create("email", s.sampleValues, s)
    assert(prompt.contains("Column Name: email"))
    assert(prompt.contains("a@b.com"))
    assert(prompt.contains("Total Rows: 100"))
    assert(prompt.contains("\"data_type\""))
  }

  // --- H3: merge branches (test_classifiers.py:230-268) ---------------------

  private def freshEngine(
      cfg: HybridConfig = HybridConfig(enableAi = false)
  ) = new HybridEngine(cfg)

  test("H3 consensus agreement boosts confidence to min(0.95, mean + 0.1)") {
    val eng = freshEngine()
    val merged = eng.merge(
      mkProfile("email", SemanticType.Email, 0.8, PiiLevel.High),
      Some(mkProfile("email", SemanticType.Email, 0.9, PiiLevel.High))
    )
    assert(merged.dataType == SemanticType.Email)
    assert(merged.confidenceScore == math.min(0.95, (0.8 + 0.9) / 2 + 0.1))
    assert(merged.confidenceScore > 0.8) // the reference's visible assertion
    assert(merged.dataQualityNotes == "Pattern and AI consensus")
    assert(eng.hybridStats.consensusAgreement == 1)
  }

  test("H3 AI override at ai confidence >= threshold replaces the data type") {
    val eng = freshEngine()
    val merged = eng.merge(
      mkProfile("customer_id", SemanticType.Identifier, 0.8),
      Some(mkProfile("customer_id", SemanticType.BusinessKey, 0.95, meaning = "Business identifier"))
    )
    assert(merged.dataType == SemanticType.BusinessKey)
    assert(merged.dataQualityNotes.contains("AI override"))
    assert(merged.confidenceScore == 0.95)
    assert(eng.hybridStats.aiOverride == 1)
    assert(eng.hybridStats.consensusDisagreement == 1)
  }

  test("H3 pattern wins below AI threshold when pattern is confident") {
    val eng = freshEngine()
    val merged = eng.merge(
      mkProfile("col", SemanticType.Text, 0.8),
      Some(mkProfile("col", SemanticType.BusinessKey, 0.5))
    )
    assert(merged.dataType == SemanticType.Text)
    assert(merged.confidenceScore == 0.8)
    assert(merged.dataQualityNotes == "Pattern classification, AI enhanced")
    assert(eng.hybridStats.aiEnhanced == 1)
  }

  test("H3 low-confidence blend averages the two confidences") {
    val eng = freshEngine(HybridConfig(enableAi = false, patternConfidenceThreshold = 0.7))
    val merged = eng.merge(
      mkProfile("col", SemanticType.Text, 0.6),
      Some(mkProfile("col", SemanticType.Numeric, 0.5))
    )
    assert(merged.dataType == SemanticType.Text)
    assert(merged.confidenceScore == (0.6 + 0.5) / 2)
    assert(merged.dataQualityNotes == "Hybrid result: pattern type, AI insights")
  }

  test("H3 no-AI merge keeps pattern result, notes pattern-only") {
    val eng = freshEngine()
    val merged = eng.merge(mkProfile("col", SemanticType.Text, 0.8, meaning = "m"), None)
    assert(merged.dataQualityNotes == "Pattern-based classification only")
    assert(merged.businessMeaning == "m")
    assert(eng.hybridStats.patternOnly == 1)
  }

  test("H4 PII merges by ordinal severity, not alphabetically (SURVEY §0.2(4))") {
    val eng = freshEngine()
    val merged = eng.merge(
      mkProfile("col", SemanticType.Text, 0.8, PiiLevel.None),
      Some(mkProfile("col", SemanticType.Text, 0.9, PiiLevel.High))
    )
    // alphabetical max("none","high") would be "none" — the reference's bug
    assert(merged.piiLevel == PiiLevel.High)
  }

  // --- H1/H7: gating, thresholds, stats (test_classifiers.py:216-303) -------

  test("H1 pattern-only mode on a real DataFrame (test_pattern_only_mode)") {
    val df = Seq((1, "a@b.com"), (2, "c@d.org")).toDF("id", "email")
    val eng = freshEngine()
    val result = eng.analyzeDataFrame(df)
    assert(result.columnProfiles.size == df.columns.length)
    assert(result.classificationMethod == "hybrid_pattern_only")
    assert(!eng.aiEnabled)
  }

  test("H6 hybrid with a scripted provider actually consults it") {
    val live = new ScriptedProvider("live", _ => Some(emailVerdictJson))
    val eng = new HybridEngine(HybridConfig(enableAi = true), Some(new AiClassifier(Seq(live))))
    val df = Seq(("x@y.com", 1), ("z@w.org", 2)).toDF("email", "n")
    val result = eng.analyzeDataFrame(df)
    assert(eng.aiEnabled)
    assert(result.classificationMethod == "hybrid_ai")
    val email = result.columnProfiles.find(_.originalName == "email").get
    // pattern says email, scripted AI says email → consensus
    assert(email.dataQualityNotes == "Pattern and AI consensus")
  }

  test("H7 stats track one exclusive bucket per processed column") {
    val eng = freshEngine()
    eng.merge(mkProfile("a", SemanticType.Text, 0.8), None)
    eng.merge(
      mkProfile("b", SemanticType.Email, 0.8),
      Some(mkProfile("b", SemanticType.Email, 0.9))
    )
    eng.merge(
      mkProfile("c", SemanticType.Text, 0.8),
      Some(mkProfile("c", SemanticType.Numeric, 0.95))
    )
    val s = eng.hybridStats
    assert(s.total == 3) // pattern_only + consensus + override
    assert(s.consensusDisagreement == 1)
    val m = HybridEngine.statsWithPercentages(s)
    assert(m("total_processed") == 3L)
    val pct = m("percentages").asInstanceOf[Map[String, Double]]
    val exclusive = Seq("pattern_only", "ai_enhanced", "ai_override", "consensus_agreement")
    assert(math.abs(exclusive.map(pct).sum - 100.0) < 0.5)
  }

  test("H7 counters are race-free under parallel merge (ADVICE r1)") {
    val eng = freshEngine()
    val p = mkProfile("x", SemanticType.Text, 0.8)
    val threads = (1 to 8).map { _ =>
      new Thread(() => (1 to 500).foreach(_ => eng.merge(p, None)))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(eng.hybridStats.patternOnly == 4000)
  }

  test("H1 set_ai_enabled refuses without a provider-backed classifier") {
    val eng = freshEngine()
    assert(!eng.setAiEnabled(true))
    assert(!eng.aiEnabled)
    val withAi = new HybridEngine(
      HybridConfig(enableAi = false),
      Some(new AiClassifier(Seq(new ScriptedProvider("p", _ => None))))
    )
    assert(withAi.setAiEnabled(true))
    assert(withAi.aiEnabled)
  }

  test("H1 confidence thresholds are configurable (test_confidence_thresholds)") {
    assert(new HybridEngine(HybridConfig(enableAi = false, aiConfidenceThreshold = 0.6)).config.aiConfidenceThreshold == 0.6)
    assert(new HybridEngine(HybridConfig(enableAi = false, aiConfidenceThreshold = 0.9)).config.aiConfidenceThreshold == 0.9)
  }

  test("H2 single-column entry point merges pattern and AI for just that column") {
    val live = new ScriptedProvider("live", _ => Some(emailVerdictJson))
    val eng = new HybridEngine(HybridConfig(enableAi = true), Some(new AiClassifier(Seq(live))))
    val df = Seq(("x@y.com", 1), ("z@w.org", 2)).toDF("email", "n")
    val p = eng.analyzeColumn(df, "email")
    assert(p.originalName == "email")
    assert(p.dataType == SemanticType.Email)
    assert(p.dataQualityNotes == "Pattern and AI consensus")
    // without AI: pure pattern result for the named column
    val p2 = new HybridEngine(HybridConfig(enableAi = false)).analyzeColumn(df, "n")
    assert(p2.originalName == "n")
    assert(p2.dataQualityNotes == "Pattern-based classification only")
  }

  // --- A4 via record/replay: canned transcripts drive the full path ---------

  private def replayTranscript: String = {
    val in = getClass.getResourceAsStream("/replay/profile_transcript.json")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  test("A4 replayed transcript drives A5 parse → A6 profile → H3 merge end-to-end") {
    // the recorded transcript covers three columns (fenced + bare JSON);
    // `misc` is deliberately absent so every merge branch fires in one run
    val replay = ReplayProvider.fromJson("replayed-claude", replayTranscript)
    val eng = new HybridEngine(HybridConfig(enableAi = true), Some(new AiClassifier(Seq(replay))))
    val rows = (0 until 12).map { i =>
      (s"call supervisor about case ${i % 6}",
       s"ticket escalated by agent ${i % 6}",
       s"resolved after follow up ${i % 6}",
       s"archived batch ${i % 6}")
    }
    val df = rows.toDF("notes", "description", "comment", "misc")
    val got = eng.analyzeDataFrame(df).columnProfiles.map(p => p.originalName -> p).toMap

    // notes: pattern says text(0.8), replayed AI says email at 0.9 ≥ 0.8 →
    // the AI-override branch flips the column type (the r5 verdict's bar)
    assert(got("notes").dataType == SemanticType.Email)
    assert(got("notes").dataQualityNotes.contains("AI override"))
    assert(got("notes").confidenceScore == 0.9)
    assert(got("notes").piiLevel == PiiLevel.High)

    // description: AI disagrees at 0.6 < 0.8 while pattern holds 0.8 ≥ 0.7 →
    // pattern type survives, AI insights merged
    assert(got("description").dataType == SemanticType.Text)
    assert(got("description").dataQualityNotes == "Pattern classification, AI enhanced")
    assert(got("description").confidenceScore == 0.8)

    // comment: both say text → consensus boost min(0.95, (0.8+0.9)/2 + 0.1)
    assert(got("comment").dataType == SemanticType.Text)
    assert(got("comment").dataQualityNotes == "Pattern and AI consensus")
    assert(got("comment").confidenceScore == 0.95)
    assert(got("comment").piiLevel == PiiLevel.Low)
    assert(got("comment").businessMeaning == "Free-form remarks")

    // misc: not in the transcript → provider misses → pattern-only branch
    assert(got("misc").dataQualityNotes == "Pattern-based classification only")

    val s = eng.hybridStats
    assert(s.patternOnly == 1 && s.consensusAgreement == 1)
    assert(s.aiOverride == 1 && s.aiEnhanced == 1 && s.consensusDisagreement == 2)
  }

  test("A4 record → replay round-trip reproduces the live provider verbatim") {
    val live = new ScriptedProvider("live", p =>
      ReplayProvider.columnOf(p).map(c => s"""{"data_type": "text", "business_meaning": "col $c"}"""))
    val rec = new RecordingProvider(live)
    val stats = mkStats("remarks")
    val prompt = AiPrompt.create(stats.name, stats.sampleValues, stats)
    val liveOut = rec.complete(prompt)
    assert(liveOut.isDefined && rec.transcript.contains("remarks"))
    val replay = ReplayProvider.fromJson("replayed", rec.transcriptJson)
    assert(replay.complete(prompt) == liveOut)
    // replay never invents completions for unrecorded columns
    val other = AiPrompt.create("unseen", Nil, mkStats("unseen"))
    assert(replay.complete(other).isEmpty)
  }

  test("A4 malformed transcripts fail at load, not as silent always-miss providers") {
    intercept[IllegalArgumentException](ReplayProvider.fromJson("bad", """["not", "an", "object"]"""))
    intercept[IllegalArgumentException](ReplayProvider.fromJson("bad", """{"col": 42}"""))
  }

  // --- Integration (test_classifiers.py:287-304) ----------------------------

  test("I pattern and hybrid-no-AI agree on data types (test_all_classifiers_same_input)") {
    val df = Seq(
      (1001, "john@example.com", "active"),
      (1002, "jane@test.org", "inactive"),
      (1003, "bob@company.co.uk", "active")
    ).toDF("customer_id", "email", "status")
    val patternProfiles =
      new graft.engine.ProfilerEngine().analyzeDataFrame(df).columnProfiles.map(p => p.originalName -> p.dataType).toMap
    val hybridProfiles =
      freshEngine().analyzeDataFrame(df).columnProfiles.map(p => p.originalName -> p.dataType).toMap
    assert(patternProfiles == hybridProfiles)
  }
}
