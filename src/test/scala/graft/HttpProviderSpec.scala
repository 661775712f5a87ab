package graft

import java.net.URI

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

import graft.ai._
import graft.model._

/** A4 — live-provider HTTP surface (`ai_classifier.py:182-209`), exercised
  * entirely through the transport seam: request shaping and response
  * extraction per vendor, env double-gating, and a completion flowing the
  * full A5→A6 path. NO socket is ever opened (the build is zero-egress; the
  * JDK transport is only reachable through [[HttpProvider.fromEnv]]'s
  * explicit opt-in, which these tests prove stays shut).
  */
class HttpProviderSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private final class FakeTransport(respond: (URI, Map[String, String], String) => Option[String])
      extends HttpTransport {
    var calls: List[(URI, Map[String, String], String)] = Nil
    def post(uri: URI, headers: Map[String, String], body: String): Option[String] = {
      calls ::= (uri, headers, body)
      respond(uri, headers, body)
    }
  }

  // Wire constants (endpoint/model/version header) are injected config, never
  // source literals — the same way fromEnv supplies them from the environment.
  private def provider(vendor: String, t: HttpTransport) =
    new HttpProvider(vendor, URI.create(s"https://example.invalid/$vendor"), "k-123", "m-1",
      Map("x-vendor-version" -> "v-2099"), t)

  test("claude shape: messages body, x-api-key header, content[0].text extraction") {
    val resp = """{"content":[{"type":"text","text":"  {\"data_type\": \"email\"} "}]}"""
    val t = new FakeTransport((_, _, _) => Some(resp))
    val out = provider("claude", t).complete("hello")
    assert(out.contains("""{"data_type": "email"}""")) // trimmed like the reference
    val (uri, headers, body) = t.calls.head
    assert(uri.toString == "https://example.invalid/claude")
    assert(headers("x-api-key") == "k-123" && headers("x-vendor-version") == "v-2099")
    val b = mapper.readTree(body)
    assert(b.get("model").asText == "m-1" && b.get("max_tokens").asInt == 1000)
    assert(b.get("messages").get(0).get("role").asText == "user")
    assert(b.get("messages").get(0).get("content").asText == "hello")
  }

  test("openai shape: chat body with temperature 0.1, bearer auth, choices[0].message.content") {
    val resp = """{"choices":[{"message":{"role":"assistant","content":"ok"}}]}"""
    val t = new FakeTransport((_, _, _) => Some(resp))
    assert(provider("openai", t).complete("p").contains("ok"))
    val (_, headers, body) = t.calls.head
    assert(headers("authorization") == "Bearer k-123")
    val b = mapper.readTree(body)
    assert(b.get("temperature").asDouble == 0.1 && b.get("max_tokens").asInt == 1000)
  }

  test("gemini shape: key as x-goog-api-key header (never in the URL), candidates path extraction") {
    val resp =
      """{"candidates":[{"content":{"parts":[{"text":"verdict"}],"role":"model"}}]}"""
    val t = new FakeTransport((_, _, _) => Some(resp))
    assert(provider("gemini", t).complete("p").contains("verdict"))
    val (uri, headers, body) = t.calls.head
    assert(uri.getQuery == null, "API key must not ride the URL (log/proxy leak surface)")
    assert(headers("x-goog-api-key") == "k-123")
    assert(!headers.contains("authorization") && !headers.contains("x-api-key"))
    assert(mapper.readTree(body).get("contents").get(0).get("parts").get(0).get("text").asText == "p")
  }

  test("structural surprises and transport failure degrade to None (A2 fallback), never throw") {
    val shapes = Seq(
      None,                              // HTTP failure
      Some("""{"unexpected": true}"""),  // missing path
      Some("""{"content": []}"""),       // empty array
      Some("not json at all"),           // parse explosion inside extract
      Some("""{"content":[{"text":""}]}""") // empty completion
    )
    for (r <- shapes) {
      val t = new FakeTransport((_, _, _) => r)
      assert(provider("claude", t).complete("p").isEmpty, s"for $r")
    }
  }

  test("unknown vendor is rejected at construction") {
    intercept[IllegalArgumentException](provider("mistral", new FakeTransport((_, _, _) => None)))
  }

  test("fromEnv requires flag+key+endpoint+model; any subset yields None") {
    val full = Map(
      "GRAFT_AI_HTTP"         -> "1",
      "GRAFT_CLAUDE_API_KEY"  -> "k",
      "GRAFT_CLAUDE_ENDPOINT" -> "https://example.invalid/v1/x",
      "GRAFT_CLAUDE_MODEL"    -> "m-1"
    )
    assert(HttpProvider.fromEnv("claude", Map.empty).isEmpty)
    for (missing <- full.keys)
      assert(HttpProvider.fromEnv("claude", full - missing).isEmpty, s"without $missing")
    assert(HttpProvider.fromEnv("claude", full + ("GRAFT_AI_HTTP" -> "0")).isEmpty)
    // and the real gate environment has the master flag unset
    assert(!sys.env.contains("GRAFT_AI_HTTP"))
  }

  test("fromEnv with full explicit opt-in constructs the vendor (still no socket here)") {
    val p = HttpProvider.fromEnv("openai", Map(
      "GRAFT_AI_HTTP"         -> "1",
      "GRAFT_OPENAI_API_KEY"  -> "k",
      "GRAFT_OPENAI_ENDPOINT" -> "https://example.invalid/v1/chat",
      "GRAFT_OPENAI_MODEL"    -> "m-9"
    ))
    assert(p.exists(_.name == "openai"))
  }

  test("extra-headers spec parses name:value pairs, value may contain ':'") {
    assert(HttpProvider.parseHeaders("") == Map.empty)
    assert(HttpProvider.parseHeaders("x-a:1, X-B:t:z ,bad,:v") ==
      Map("x-a" -> "1", "x-b" -> "t:z"))
  }

  test("a stray extra-headers pair cannot clobber the auth header") {
    val t = new FakeTransport((_, _, _) => None)
    val p = new HttpProvider("claude", URI.create("https://example.invalid/c"), "real-key", "m-1",
      Map("x-api-key" -> "stale-key", "x-other" -> "kept"), t)
    p.complete("hi")
    val (_, headers, _) = t.calls.head
    assert(headers("x-api-key") == "real-key") // auth applied last, wins
    assert(headers("x-other") == "kept")
  }

  test("an HTTP completion flows the unchanged A5→A6 path into a profile") {
    val fenced =
      """```json
        |{"data_type": "email", "is_primary_key": false, "is_business_key": false,
        | "pii_level": "high", "confidence_score": 0.93,
        | "business_meaning": "Customer email", "data_quality_notes": "",
        | "suggested_improvements": ""}
        |```""".stripMargin
    val resp = mapper.createObjectNode()
    resp.putArray("content").addObject().put("type", "text").put("text", fenced)
    val t  = new FakeTransport((_, _, _) => Some(mapper.writeValueAsString(resp)))
    val ai = new AiClassifier(Seq(provider("claude", t)))
    val stats = ColumnStats("email", 10, 10, 10, Map.empty, Seq("a@b.com"))
    val (prov, verdict) = ai.verdictFor(stats).get
    assert(prov == "claude")
    assert(verdict.dataType == SemanticType.Email && verdict.piiLevel == PiiLevel.High)
    assert(math.abs(verdict.confidenceScore - 0.93) < 1e-9)
  }
}
