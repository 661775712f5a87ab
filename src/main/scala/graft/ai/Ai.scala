package graft.ai

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.model._

/** An LLM verdict for one column — the 8-key JSON contract demanded by the
  * reference's analysis prompt (`ai_classifier.py:148-158`).
  */
final case class AiVerdict(
    dataType: SemanticType,
    isPrimaryKey: Boolean = false,
    isBusinessKey: Boolean = false,
    piiLevel: PiiLevel = PiiLevel.None,
    confidenceScore: Double = 0.7,
    businessMeaning: String = "",
    dataQualityNotes: String = "",
    suggestedImprovements: String = ""
)

/** A pluggable LLM completion backend (reference: the per-provider clients,
  * `ai_classifier.py:36-55,182-209`). The engine core is zero-egress: the
  * only bundled implementation is [[NoopProvider]]; a real HTTP-backed
  * provider plugs in from the outside. Implementations must be
  * deterministic-or-absent from the oracle's point of view — AI output never
  * participates in hash-checked queries.
  */
trait AiProvider {
  def name: String

  /** Return the raw completion text for a prompt, or None on failure. */
  def complete(prompt: String): Option[String]
}

/** Zero-egress default: always fails, putting the engine in the reference's
  * "pattern-only mode" (`hybrid_classifier.py:82`).
  */
object NoopProvider extends AiProvider {
  val name = "noop"
  def complete(prompt: String): Option[String] = None
}

/** Deterministic scripted provider for tests (mirrors the reference's mocked
  * clients, `tests/unit/test_classifiers.py:155-176`).
  */
final class ScriptedProvider(val name: String, script: String => Option[String])
    extends AiProvider {
  def complete(prompt: String): Option[String] = script(prompt)
}

object AiPrompt {

  /** `_create_analysis_prompt` (`ai_classifier.py:137-167`) — pure function;
    * the JSON contract doubles as the [[AiVerdict]] schema.
    */
  def create(columnName: String, sampleValues: Seq[String], stats: ColumnStats): String = {
    val samples = sampleValues.take(5).mkString("[", ", ", "]")
    f"""Analyze this database column and provide classification in JSON format.
       |
       |Column Name: $columnName
       |Sample Values: $samples
       |Total Rows: ${stats.totalRows}
       |Unique Values: ${stats.uniqueCount}
       |Null Values: ${stats.nullCount}
       |Unique Ratio: ${stats.uniqueRatio}%.3f
       |
       |Classify this column and return ONLY a valid JSON object with these exact keys:
       |{
       |    "data_type": "one of: identifier, business_key, date, numeric, text, boolean, email, phone, address",
       |    "is_primary_key": boolean,
       |    "is_business_key": boolean,
       |    "pii_level": "one of: none, low, medium, high",
       |    "confidence_score": float between 0.0 and 1.0,
       |    "business_meaning": "Brief description of what this column represents",
       |    "data_quality_notes": "Any data quality observations",
       |    "suggested_improvements": "Recommendations for data quality improvement"
       |}
       |
       |Consider:
       |- Column name patterns and business context
       |- Sample value patterns and formats
       |- Statistical properties (uniqueness, nulls)
       |- Privacy implications (PII classification)
       |- Business meaning and purpose
       |
       |Return only the JSON object, no additional text.""".stripMargin
  }
}

object AiResponseParser {
  private val mapper = new ObjectMapper()

  /** `_parse_ai_response` (`ai_classifier.py:211-221`, truncated in the
    * snapshot; behavior completed from its tests,
    * `tests/unit/test_classifiers.py:187-213`): strip markdown code fences,
    * parse JSON, return None for anything invalid. Total function.
    */
  def parse(responseText: String): Option[AiVerdict] = {
    val cleaned =
      if (responseText.contains("```json"))
        responseText.split("```json", 2)(1).split("```", 2)(0)
      else if (responseText.contains("```"))
        responseText.split("```", -1).lift(1).getOrElse("")
      else responseText

    try {
      val node = mapper.readTree(cleaned.trim)
      if (node == null || !node.isObject) return None
      fromJson(node)
    } catch {
      case _: Exception => None
    }
  }

  private def textOr(node: JsonNode, key: String, default: String): String = {
    val v = node.get(key)
    if (v == null || v.isNull) default else v.asText(default)
  }

  private def fromJson(node: JsonNode): Option[AiVerdict] = {
    val dtNode = node.get("data_type")
    if (dtNode == null) return None
    SemanticType.fromValue(dtNode.asText("")).map { dt =>
      AiVerdict(
        dataType = dt,
        isPrimaryKey = node.path("is_primary_key").asBoolean(false),
        isBusinessKey = node.path("is_business_key").asBoolean(false),
        piiLevel =
          PiiLevel.fromValue(textOr(node, "pii_level", "none")).getOrElse(PiiLevel.None),
        confidenceScore = node.path("confidence_score").asDouble(0.7),
        businessMeaning = textOr(node, "business_meaning", ""),
        dataQualityNotes = textOr(node, "data_quality_notes", ""),
        suggestedImprovements = textOr(node, "suggested_improvements", "")
      )
    }
  }
}
