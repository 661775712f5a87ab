package graft.serve

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import graft.model.ColumnProfile

/** The profile-as-a-service surface — the Spark-native twin of the
  * reference's DECLARED-but-never-built FastAPI app (`pyproject.toml:18-21`
  * ships fastapi/uvicorn deps and `.env.example` documents an upload→profile
  * API, but the `api/` package is 0-byte stubs). Endpoints:
  *
  *   - `GET /health` → `{"status":"ok"}`
  *   - `GET /profile?path=<dataset>` or `POST /profile` with body
  *     `{"path": "<dataset>"}` → the per-column classification table as a
  *     JSON array (parquet / csv / jsonl, dispatched by extension like the
  *     CLI).
  *
  * Built on the JDK's own httpserver — the zero-egress build adds no HTTP
  * framework dependency. Binds loopback by default: this is a driver-side
  * control endpoint (profiling runs as Spark jobs on the cluster), not a
  * data-plane service; put real auth in front before binding wider.
  * Profiling is driver-coordinated and the engine is thread-safe, so the
  * default executor's concurrency is fine at control-plane request rates.
  */
object ProfileServer {

  private val mapper = new ObjectMapper()

  private[serve] def profilesToJson(profiles: Seq[ColumnProfile]): String = {
    val arr = mapper.createArrayNode()
    profiles.foreach { p =>
      val o = arr.addObject()
      o.put("column_name", p.originalName)
      o.put("suggested_name", p.suggestedName)
      o.put("data_type", p.dataType.value)
      o.put("is_primary_key", p.isPrimaryKey)
      o.put("is_business_key", p.isBusinessKey)
      o.put("pii_level", p.piiLevel.value)
      o.put("total_rows", p.totalRows)
      o.put("null_count", p.nullCount)
      o.put("unique_count", p.uniqueCount)
      o.put("null_ratio", p.nullRatio)
      o.put("unique_ratio", p.uniqueRatio)
      o.put("confidence_score", p.confidenceScore)
      o.put("business_meaning", p.businessMeaning)
    }
    mapper.writeValueAsString(arr)
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json; charset=utf-8")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes)
    finally os.close()
  }

  private def err(msg: String): String =
    mapper.createObjectNode().put("error", msg).toString

  private[serve] def pathOf(ex: HttpExchange): Option[String] = {
    val fromQuery = Option(ex.getRequestURI.getRawQuery)
      .flatMap(_.split('&').collectFirst {
        case kv if kv.startsWith("path=") =>
          java.net.URLDecoder.decode(kv.drop(5), "UTF-8")
      })
    val fromBody =
      if (ex.getRequestMethod == "POST") {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        try {
          val node = mapper.readTree(body)
          Option(node).filter(_.isObject).map(_.path("path")).filter(_.isTextual).map(_.asText())
        } catch { case _: Exception => None }
      } else None
    fromQuery.orElse(fromBody).filter(_.nonEmpty)
  }

  /** Start the server; `port = 0` picks an ephemeral port (tests). Returns
    * the running server — callers stop it with `.stop(0)`.
    */
  def start(spark: SparkSession, port: Int, host: String = "127.0.0.1"): HttpServer = {
    val engine = new graft.engine.ProfilerEngine()
    val server = HttpServer.create(new InetSocketAddress(host, port), 0)
    server.createContext("/health", new HttpHandler {
      def handle(ex: HttpExchange): Unit = respond(ex, 200, """{"status":"ok"}""")
    })
    server.createContext("/profile", new HttpHandler {
      def handle(ex: HttpExchange): Unit =
        pathOf(ex) match {
          case None =>
            respond(ex, 400, err("missing 'path' (query param or JSON body)"))
          case Some(p) =>
            try {
              val df = graft.Main.readAny(spark, p)
              respond(ex, 200, profilesToJson(engine.analyzeDataFrame(df).columnProfiles))
            } catch {
              case e: org.apache.spark.sql.AnalysisException =>
                respond(ex, 404, err(s"cannot read dataset: ${e.getMessage.takeWhile(_ != '\n')}"))
              case e: Exception =>
                respond(ex, 500, err(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).takeWhile(_ != '\n')}"))
            }
        }
    })
    server.start()
    server
  }
}

/** `runMain graft.serve.Serve [port]` — standalone service entry point. */
object Serve {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8080)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-serve")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = ProfileServer.start(spark, port)
    println(s"graft profile service listening on ${server.getAddress}")
    Thread.currentThread().join() // serve until killed
  }
}
