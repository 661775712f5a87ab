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

  private def provider(vendor: String, t: HttpTransport) =
    new HttpProvider(vendor, URI.create(s"https://example.invalid/$vendor"), "k-123", "m-1", t)

  test("claude shape: messages body, x-api-key header, content[0].text extraction") {
    val resp = """{"content":[{"type":"text","text":"  {\"data_type\": \"email\"} "}]}"""
    val t = new FakeTransport((_, _, _) => Some(resp))
    val out = provider("claude", t).complete("hello")
    assert(out.contains("""{"data_type": "email"}""")) // trimmed like the reference
    val (uri, headers, body) = t.calls.head
    assert(uri.toString == "https://example.invalid/claude")
    assert(headers("x-api-key") == "k-123" && headers.contains("anthropic-version"))
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

  test("gemini shape: key in query param, contents/parts body, candidates path extraction") {
    val resp =
      """{"candidates":[{"content":{"parts":[{"text":"verdict"}],"role":"model"}}]}"""
    val t = new FakeTransport((_, _, _) => Some(resp))
    assert(provider("gemini", t).complete("p").contains("verdict"))
    val (uri, headers, body) = t.calls.head
    assert(uri.toString.endsWith("?key=k-123"))
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

  test("fromEnv is double-gated: no flag, no key, flag-without-key all yield None") {
    assert(HttpProvider.fromEnv("claude", Map.empty).isEmpty)
    assert(HttpProvider.fromEnv("claude", Map("GRAFT_CLAUDE_API_KEY" -> "k")).isEmpty)
    assert(HttpProvider.fromEnv("claude", Map("GRAFT_AI_HTTP" -> "1")).isEmpty)
    assert(HttpProvider.fromEnv("claude", Map("GRAFT_AI_HTTP" -> "0", "GRAFT_CLAUDE_API_KEY" -> "k")).isEmpty)
    // and the real gate environment has neither var set
    assert(!sys.env.contains("GRAFT_AI_HTTP"))
  }

  test("fromEnv with explicit opt-in constructs the vendor (still no socket here)") {
    val p = HttpProvider.fromEnv("openai", Map("GRAFT_AI_HTTP" -> "1", "GRAFT_OPENAI_API_KEY" -> "k"))
    assert(p.exists(_.name == "openai"))
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
