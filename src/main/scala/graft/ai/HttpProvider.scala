package graft.ai

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Transport seam under [[HttpProvider]]: one POST, returning the response
  * body on 2xx. Production uses [[HttpProvider.JdkTransport]] (JDK 11+
  * HttpClient, no extra dependency); specs substitute a fake to exercise
  * request shaping and response extraction with NO socket — the same
  * strategy as the reference's mocked provider clients
  * (`tests/unit/test_classifiers.py:155-176`).
  */
trait HttpTransport {
  def post(uri: URI, headers: Map[String, String], body: String): Option[String]
}

/** Live LLM provider over HTTP — the A4 surface the reference implements as
  * per-vendor SDK clients (`ai_classifier.py:182-209`: Claude messages,
  * Gemini generateContent, OpenAI chat completions). Re-expressed as one
  * class with per-vendor request/response shapes; the returned text flows
  * through the unchanged A5→A6→H3 parse/merge path, exactly like a
  * [[ReplayProvider]] completion.
  *
  * OUT-OF-GATE BY CONSTRUCTION: the build environment has zero egress, so
  * nothing in the oracle gate, the bench, or `sbt test` ever constructs one
  * of these against a live endpoint. [[HttpProvider.fromEnv]] is the only
  * production entry point and returns None unless the operator explicitly
  * opts in (`GRAFT_AI_HTTP=1` AND a per-vendor API key) — absent that, the
  * engine stays in pattern-only/replay mode ([[NoopProvider]]).
  */
final class HttpProvider(
    val name: String,
    endpoint: URI,
    apiKey: String,
    model: String,
    transport: HttpTransport
) extends AiProvider {
  import HttpProvider._

  require(Vendors.contains(name), s"unknown vendor '$name' (one of ${Vendors.mkString(", ")})")

  def complete(prompt: String): Option[String] =
    try transport.post(requestUri, requestHeaders, requestBody(prompt)).flatMap(extractText)
    catch { case scala.util.control.NonFatal(_) => None } // provider failure → fallback chain (A2)

  /** Gemini authenticates via query parameter; the rest via headers. */
  private[ai] def requestUri: URI =
    if (name == "gemini") URI.create(s"$endpoint?key=$apiKey") else endpoint

  private[ai] def requestHeaders: Map[String, String] = name match {
    case "claude" =>
      Map("content-type" -> "application/json", "x-api-key" -> apiKey, "anthropic-version" -> "2023-06-01")
    case "openai" =>
      Map("content-type" -> "application/json", "authorization" -> s"Bearer $apiKey")
    case "gemini" =>
      Map("content-type" -> "application/json")
  }

  /** The vendor wire shape for one user-role prompt (mirrors the reference's
    * client calls: max_tokens 1000; temperature 0.1 for OpenAI).
    */
  private[ai] def requestBody(prompt: String): String = {
    val root = mapper.createObjectNode()
    name match {
      case "claude" =>
        root.put("model", model).put("max_tokens", 1000)
        root.putArray("messages").addObject().put("role", "user").put("content", prompt)
      case "openai" =>
        root.put("model", model).put("max_tokens", 1000).put("temperature", 0.1)
        root.putArray("messages").addObject().put("role", "user").put("content", prompt)
      case "gemini" =>
        root.putArray("contents").addObject().putArray("parts").addObject().put("text", prompt)
    }
    mapper.writeValueAsString(root)
  }

  /** The vendor response path to the completion text (content[0].text /
    * choices[0].message.content / candidates[0].content.parts[0].text),
    * trimmed as the reference does. None on any structural surprise.
    */
  private[ai] def extractText(responseBody: String): Option[String] = {
    def at(node: JsonNode, path: Any*): Option[JsonNode] =
      path.foldLeft(Option(node)) {
        case (Some(n), s: String) => Option(n.get(s))
        case (Some(n), i: Int)    => Option(n.get(i))
        case _                    => None
      }
    val node = mapper.readTree(responseBody)
    val text = name match {
      case "claude" => at(node, "content", 0, "text")
      case "openai" => at(node, "choices", 0, "message", "content")
      case "gemini" => at(node, "candidates", 0, "content", "parts", 0, "text")
    }
    text.filter(_.isTextual).map(_.asText().trim).filter(_.nonEmpty)
  }
}

object HttpProvider {
  private val mapper = new ObjectMapper()

  val Vendors: Seq[String] = Seq("claude", "gemini", "openai")

  /** Default endpoints + models per vendor (override via env). Models are the
    * ones the reference pins (`ai_classifier.py:185,202`); Gemini's SDK call
    * resolves to the v1beta generateContent REST endpoint.
    */
  private val Defaults: Map[String, (String, String)] = Map(
    "claude" -> (("https://api.anthropic.com/v1/messages", "claude-3-sonnet-20240229")),
    "openai" -> (("https://api.openai.com/v1/chat/completions", "gpt-4")),
    "gemini" -> (("https://generativelanguage.googleapis.com/v1beta/models/gemini-pro:generateContent", "gemini-pro"))
  )

  object JdkTransport extends HttpTransport {
    private lazy val client =
      HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

    def post(uri: URI, headers: Map[String, String], body: String): Option[String] = {
      val b = HttpRequest.newBuilder(uri).timeout(Duration.ofSeconds(60))
      headers.foreach { case (k, v) => b.header(k, v) }
      val resp = client.send(
        b.POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8)).build(),
        HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8)
      )
      if (resp.statusCode() / 100 == 2) Some(resp.body()) else None
    }
  }

  /** The ONLY production constructor, and it is opt-in twice over: returns
    * None unless `GRAFT_AI_HTTP=1` and `GRAFT_<VENDOR>_API_KEY` are both set
    * (endpoint/model overridable via `GRAFT_<VENDOR>_ENDPOINT` /
    * `GRAFT_<VENDOR>_MODEL`). The zero-egress gate never sets these, so no
    * CI path can reach a socket.
    */
  def fromEnv(vendor: String, env: Map[String, String] = sys.env): Option[AiProvider] = {
    val up = vendor.toUpperCase
    for {
      _   <- env.get("GRAFT_AI_HTTP").filter(_ == "1")
      key <- env.get(s"GRAFT_${up}_API_KEY").filter(_.nonEmpty)
      (defaultEp, defaultModel) <- Defaults.get(vendor)
    } yield new HttpProvider(
      vendor,
      URI.create(env.getOrElse(s"GRAFT_${up}_ENDPOINT", defaultEp)),
      key,
      env.getOrElse(s"GRAFT_${up}_MODEL", defaultModel),
      JdkTransport
    )
  }
}
