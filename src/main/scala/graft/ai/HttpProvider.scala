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
  * per-vendor SDK clients (`ai_classifier.py:182-209`: messages API,
  * generateContent, chat completions). Re-expressed as one class with
  * per-vendor request/response shapes; the returned text flows through the
  * unchanged A5→A6→H3 parse/merge path, exactly like a [[ReplayProvider]]
  * completion.
  *
  * NO VENDOR WIRE CONSTANTS IN SOURCE: the endpoint URL, model id, and any
  * vendor-specific version header are configuration, not code. The operator
  * supplies them via `GRAFT_<VENDOR>_ENDPOINT` / `GRAFT_<VENDOR>_MODEL` /
  * `GRAFT_<VENDOR>_EXTRA_HEADERS` when opting in; `.env.example` at the repo
  * root documents the variable NAMES and points at each vendor's public API
  * docs for the current values (the same ones the reference pins in
  * `ai_classifier.py:185,202`) — a vendor that requires a dated version
  * header (claude) returns 4xx without it, so EXTRA_HEADERS is effectively
  * required there, as `.env.example` says. What stays in source is
  * only the structural shape: auth header name, JSON body layout, and the
  * response path to the completion text.
  *
  * OUT-OF-GATE BY CONSTRUCTION: the build environment has zero egress, so
  * nothing in the oracle gate, the bench, or `sbt test` ever constructs one
  * of these against a live endpoint. [[HttpProvider.fromEnv]] is the only
  * production entry point and returns None unless the operator explicitly
  * opts in (`GRAFT_AI_HTTP=1` AND key AND endpoint AND model) — absent
  * that, the engine stays in pattern-only/replay mode ([[NoopProvider]]).
  */
final class HttpProvider(
    val name: String,
    endpoint: URI,
    apiKey: String,
    model: String,
    extraHeaders: Map[String, String],
    transport: HttpTransport
) extends AiProvider {
  import HttpProvider._

  require(Vendors.contains(name), s"unknown vendor '$name' (one of ${Vendors.mkString(", ")})")

  def complete(prompt: String): Option[String] =
    try transport.post(endpoint, requestHeaders, requestBody(prompt)).flatMap(extractText)
    catch { case scala.util.control.NonFatal(_) => None } // provider failure → fallback chain (A2)

  /** Auth is always a header (never a URL query parameter — keys in URLs
    * leak through logs and proxies); vendor-version headers arrive via
    * `extraHeaders` so no dated wire constant lives in source. The auth
    * header is applied LAST: a stray extra-headers pair must not clobber the
    * configured key (which would 401 and silently degrade to pattern-only).
    * Extra-header keys are lowercased HERE, not only in [[parseHeaders]], so
    * the last-wins guarantee holds for direct-constructor callers too — a
    * mixed-case 'X-Api-Key' must not ride the wire next to the real key.
    * content-type gets the same applied-last protection as auth: every
    * vendor body here IS application/json, and a stray content-type pair in
    * EXTRA_HEADERS (a pasted curl block) would otherwise 4xx into the same
    * silent pattern-only degrade.
    */
  private[ai] def requestHeaders: Map[String, String] = {
    val auth = name match {
      case "claude" => Map("x-api-key" -> apiKey)
      case "openai" => Map("authorization" -> s"Bearer $apiKey")
      case "gemini" => Map("x-goog-api-key" -> apiKey)
    }
    extraHeaders.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v } ++
      Map("content-type" -> "application/json") ++ auth
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

  /** `"k1:v1,k2:v2"` → header map; value may contain ':' (split at first). */
  private[graft] def parseHeaders(spec: String): Map[String, String] =
    spec.split(',').iterator.map(_.trim).filter(_.nonEmpty).flatMap { pair =>
      pair.split(":", 2) match {
        // Locale.ROOT: the default-locale lowercase would corrupt an 'I' on a
        // Turkish-locale JVM before requestHeaders' ROOT pass could normalize it
        case Array(k, v) if k.trim.nonEmpty =>
          Some(k.trim.toLowerCase(java.util.Locale.ROOT) -> v.trim)
        case _                              => None
      }
    }.toMap

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

  /** The ONLY production constructor, and opting in is fully explicit:
    * returns None unless ALL of `GRAFT_AI_HTTP=1`, `GRAFT_<VENDOR>_API_KEY`,
    * `GRAFT_<VENDOR>_ENDPOINT`, and `GRAFT_<VENDOR>_MODEL` are set — there
    * are deliberately no compiled-in endpoint/model defaults (see the class
    * doc; `.env.example` names the variables and defers to the vendor's
    * public docs for current values). Optional
    * `GRAFT_<VENDOR>_EXTRA_HEADERS` ("name:value,name:value") carries any
    * vendor version header. The zero-egress gate sets none of these, so no
    * CI path can reach a socket.
    */
  def fromEnv(vendor: String, env: Map[String, String] = sys.env): Option[AiProvider] = {
    // Locale.ROOT: "gemini".toUpperCase on a Turkish-locale JVM yields a
    // dotted İ, and the GRAFT_GEMİNİ_* env lookups would silently miss
    val up = vendor.toUpperCase(java.util.Locale.ROOT)
    for {
      _     <- env.get("GRAFT_AI_HTTP").filter(_ == "1")
      key   <- env.get(s"GRAFT_${up}_API_KEY").filter(_.nonEmpty)
      ep    <- env.get(s"GRAFT_${up}_ENDPOINT").filter(_.nonEmpty)
      model <- env.get(s"GRAFT_${up}_MODEL").filter(_.nonEmpty)
      if Vendors.contains(vendor)
    } yield new HttpProvider(
      vendor,
      URI.create(ep),
      key,
      model,
      parseHeaders(env.getOrElse(s"GRAFT_${up}_EXTRA_HEADERS", "")),
      JdkTransport
    )
  }
}
