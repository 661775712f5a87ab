package graft

import org.scalatest.funsuite.AnyFunSuite

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper

/** The HTTP profile service — the Spark-native twin of the reference's
  * declared-but-empty FastAPI `api/` package. Drives the real server over
  * loopback sockets: health, GET-with-query, POST-with-body, and the error
  * paths.
  */
class ProfileServerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private lazy val server = graft.serve.ProfileServer.start(spark, port = 0)
  private lazy val base = s"http://127.0.0.1:${server.getAddress.getPort}"
  private val mapper = new ObjectMapper()

  private def call(
      path: String,
      method: String = "GET",
      body: Option[String] = None
  ): (Int, String) = {
    val conn = URI.create(s"$base$path").toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write(b.getBytes(StandardCharsets.UTF_8))
      finally os.close()
    }
    val status = conn.getResponseCode
    val stream = if (status < 400) conn.getInputStream else conn.getErrorStream
    val text = new String(stream.readAllBytes(), StandardCharsets.UTF_8)
    (status, text)
  }

  test("health endpoint answers ok") {
    val (status, body) = call("/health")
    assert(status == 200 && mapper.readTree(body).path("status").asText() == "ok")
  }

  test("GET /profile?path= profiles a parquet table end-to-end") {
    val (status, body) = call("/profile?path=/root/testdata/sf0.001/customer.parquet")
    assert(status == 200, body)
    val arr = mapper.readTree(body)
    assert(arr.isArray && arr.size() == 5, body.take(200))
    val names = (0 until arr.size()).map(arr.get(_).path("column_name").asText()).toSet
    assert(names.contains("c_custkey"))
    val custkey = (0 until arr.size()).map(arr.get(_)).find(_.path("column_name").asText() == "c_custkey").get
    assert(custkey.path("data_type").asText() == "identifier")
    assert(custkey.path("is_primary_key").asBoolean())
  }

  test("POST /profile with JSON body profiles the same table") {
    val (status, body) =
      call("/profile", "POST", Some("""{"path": "/root/testdata/sf0.001/region.parquet"}"""))
    assert(status == 200, body)
    assert(mapper.readTree(body).size() == 2) // region: r_regionkey, r_name
  }

  test("missing path is a 400, unreadable dataset a 404") {
    assert(call("/profile")._1 == 400)
    assert(call("/profile", "POST", Some("not json"))._1 == 400)
    assert(call("/profile?path=/no/such/data.parquet")._1 == 404)
  }

  test("POST /upload profiles inline CSV content") {
    val csv = "user_id,email\n1,a@example.com\n2,b@example.com\n3,c@example.com\n"
    val (status, body) = call("/upload?format=csv", "POST", Some(csv))
    assert(status == 200, body)
    val node = mapper.readTree(body)
    assert(node.path("rows").asLong() == 3L)
    assert(node.path("quarantined").asLong() == 0L)
    val profiles = node.path("profiles")
    assert(profiles.size() == 2)
    val email = (0 until profiles.size()).map(profiles.get(_))
      .find(_.path("column_name").asText() == "email").get
    assert(email.path("data_type").asText() == "email")
    assert(email.path("pii_level").asText() == "high")
  }

  test("POST /upload quarantines malformed JSONL lines instead of failing") {
    val jsonl = """{"doc_id": 1, "text": "hello world"}
                  |NOT VALID JSON {{{
                  |{"doc_id": 2, "text": "goodbye"}
                  |""".stripMargin
    val (status, body) = call("/upload?format=jsonl", "POST", Some(jsonl))
    assert(status == 200, body)
    val node = mapper.readTree(body)
    assert(node.path("rows").asLong() == 2L)
    assert(node.path("quarantined").asLong() == 1L)
    val names = {
      val p = node.path("profiles")
      (0 until p.size()).map(p.get(_).path("column_name").asText()).toSet
    }
    assert(names == Set("doc_id", "text"))
  }

  test("upload guards: oversize body, bad format, unparseable content, GET") {
    // a tiny-cap server proves the cap without shipping megabytes
    val small = graft.serve.ProfileServer.start(spark, port = 0, maxUploadBytes = 64L)
    try {
      val smallBase = s"http://127.0.0.1:${small.getAddress.getPort}"
      val conn = URI.create(s"$smallBase/upload?format=csv").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write(("a,b\n" + "x,y\n" * 100).getBytes(StandardCharsets.UTF_8))
      finally os.close()
      assert(conn.getResponseCode == 400)
      val errBody = new String(conn.getErrorStream.readAllBytes(), StandardCharsets.UTF_8)
      assert(errBody.contains("MAX_FILE_SIZE"))
    } finally small.stop(0)
    assert(call("/upload?format=xml", "POST", Some("x"))._1 == 400)
    assert(call("/upload?format=jsonl", "POST", Some("NOT JSON AT ALL"))._1 == 400)
    assert(call("/upload?format=csv", "POST", Some(""))._1 == 400)
    assert(call("/upload?format=csv")._1 == 405)
  }

  test("uploaded files are deleted after profiling — the service doesn't fill the disk (r11)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upload_spec").toFile
    val s = graft.serve.ProfileServer.start(spark, port = 0, uploadDir = dir.getAbsolutePath)
    try {
      val b = s"http://127.0.0.1:${s.getAddress.getPort}"
      val conn = URI.create(s"$b/upload?format=csv").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write("a,b\n1,x\n2,y\n".getBytes(StandardCharsets.UTF_8))
      finally os.close()
      assert(conn.getResponseCode == 200)
      val leftovers = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      assert(leftovers.isEmpty, s"upload left files behind: ${leftovers.mkString(", ")}")
    } finally s.stop(0)
  }

  test("POST /profile body is size-capped; a query path wins without reading the body (r11)") {
    // over-cap body with no query path: rejected 400, never buffered whole
    val big = "x" * (graft.serve.ProfileServer.MaxProfileBodyBytes.toInt + 1024)
    assert(call("/profile", "POST", Some(big))._1 == 400)
    // path in the query: the (garbage) body is never consulted
    val (status, body) =
      call("/profile?path=/root/testdata/sf0.001/region.parquet", "POST", Some("NOT JSON {{{"))
    assert(status == 200, body)
    assert(mapper.readTree(body).size() == 2)
  }
}
