package graft.ai

import com.fasterxml.jackson.databind.ObjectMapper

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Record/replay provider pair closing the reference's live-provider surface
  * (`ai_classifier.py:182-209` — the Claude/Gemini/OpenAI HTTP calls) without
  * network egress: a [[RecordingProvider]] wraps a real provider once and
  * captures its completions as a transcript; a [[ReplayProvider]] serves that
  * transcript deterministically ever after. The replayed text flows through
  * the UNCHANGED production path — [[AiResponseParser.parse]] (A5),
  * [[AiClassifier.profileFromVerdict]] (A6), and the hybrid merge branches
  * (H3) — exactly as a live HTTP body would; only the socket is gone. This is
  * the offline twin of the reference's own test strategy, which mocks every
  * provider client (`tests/unit/test_classifiers.py:155-176,231-272`).
  *
  * Transcripts are keyed by COLUMN NAME, not the full prompt text: prompts
  * embed per-run statistics (row counts, ratios), so a byte-exact prompt key
  * would go stale on any data drift while the verdict it maps to would not.
  * The key is parsed from the prompt's `Column Name:` line — a stable field
  * of the 8-key prompt contract ([[AiPrompt.create]]).
  *
  * Transcript file format: one JSON object, column name → raw completion
  * text (fenced markdown and all — replay must preserve whatever the wire
  * carried so the fence-stripping parse path is exercised).
  */
final class ReplayProvider(val name: String, transcript: Map[String, String])
    extends AiProvider {
  def complete(prompt: String): Option[String] =
    ReplayProvider.columnOf(prompt).flatMap(transcript.get)
}

object ReplayProvider {
  private val ColumnLine = "(?m)^Column Name: (.*)$".r

  /** The transcript key for a prompt — the `Column Name:` line's value. */
  def columnOf(prompt: String): Option[String] =
    ColumnLine.findFirstMatchIn(prompt).map(_.group(1).trim).filter(_.nonEmpty)

  private val mapper = new ObjectMapper()

  /** Parse a `{column: completion}` JSON transcript. Non-object documents and
    * non-text values are rejected — a malformed transcript should fail
    * loudly at load, not as a silent always-miss provider.
    */
  def fromJson(name: String, json: String): ReplayProvider = {
    val node = mapper.readTree(json)
    require(node != null && node.isObject, s"replay transcript must be a JSON object (provider $name)")
    val entries = scala.collection.mutable.Map.empty[String, String]
    node.properties().forEach { e =>
      require(e.getValue.isTextual, s"transcript value for '${e.getKey}' must be a string")
      entries(e.getKey) = e.getValue.asText()
    }
    new ReplayProvider(name, entries.toMap)
  }

  def fromFile(name: String, path: String): ReplayProvider =
    fromJson(name, new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8))
}

/** Wraps a live provider and records every successful completion keyed by the
  * prompt's column name; [[transcriptJson]] serializes the session for
  * [[ReplayProvider]] to serve offline later.
  */
final class RecordingProvider(inner: AiProvider) extends AiProvider {
  val name: String = inner.name

  private val recorded =
    scala.collection.concurrent.TrieMap.empty[String, String]

  def complete(prompt: String): Option[String] = {
    val out = inner.complete(prompt)
    for (col <- ReplayProvider.columnOf(prompt); text <- out) recorded(col) = text
    out
  }

  def transcript: Map[String, String] = recorded.toMap

  def transcriptJson: String = {
    val mapper = new ObjectMapper()
    val node = mapper.createObjectNode()
    recorded.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node)
  }
}
