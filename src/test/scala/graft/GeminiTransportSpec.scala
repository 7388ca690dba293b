package graft

import graft.engine._
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicReference

/** Drives the live NL→SQL transport ([[GeminiSqlGenerator]]) end to end
  * against a loopback HTTP fake speaking the Gemini `generateContent`
  * response shape — the only Tier-A code path that egress-free specs
  * couldn't previously execute (reference /root/reference/doc.py:193–203).
  * No Spark session needed: the transport consumes a pre-built
  * [[DataInfo]].
  *
  * The fake is wired through the same `fromEnv` selection the CLI and
  * web server use (`GEMINI_API_KEY` + `GRAFT_GEMINI_ENDPOINT`), so the
  * spec also pins that a proxied deployment reaches the override
  * endpoint rather than the hardcoded Google host.
  */
class GeminiTransportSpec extends AnyFunSuite {

  private val dinfo = DataInfo(
    rowCount = 3, columnCount = 2,
    columns = Seq("sales_rep", "price"),
    dtypes = Map("sales_rep" -> "string", "price" -> "double"),
    head = Seq(Map("sales_rep" -> "王红", "price" -> 9.5)))

  /** One-shot loopback server: answers every request with `status`/`body`
    * and records the last request (method, path, headers, body). */
  private def withFake(status: Int, body: String)(
      run: (String, AtomicReference[(String, String, java.net.http.HttpHeaders)]) => Unit): Unit = {
    val seen = new AtomicReference[(String, String, java.net.http.HttpHeaders)]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val reqBody = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      seen.set((s"${ex.getRequestMethod} ${ex.getRequestURI}", reqBody,
        java.net.http.HttpHeaders.of(ex.getRequestHeaders,
          (_: String, _: String) => true)))
      val out = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(status, out.length)
      ex.getResponseBody.write(out)
      ex.close()
    })
    server.start()
    try run(s"http://127.0.0.1:${server.getAddress.getPort}", seen)
    finally server.stop(0)
  }

  private def geminiJson(text: String): String = {
    // the shape doc.py reads: candidates[0].content.parts[0].text
    val escaped = text.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c => c.toString
    }
    s"""{"candidates":[{"content":{"parts":[{"text":"$escaped"}],"role":"model"},"finishReason":"STOP"}],"modelVersion":"fake"}"""
  }

  test("success path: POSTs the schema-grounded prompt, strips fences") {
    val sql = "SELECT sales_rep FROM data_table LIMIT 5"
    withFake(200, geminiJson(s"```sql\n$sql\n```")) { (base, seen) =>
      val gen = SqlGenerator.fromEnv(Map(
        "GEMINI_API_KEY" -> "fake-key-123",
        "GRAFT_GEMINI_ENDPOINT" -> base))
      assert(gen.isInstanceOf[GeminiSqlGenerator])
      val out = gen.generate("哪个销售卖得最好?", dinfo)
      assert(out == sql)
      val (reqLine, reqBody, headers) = seen.get()
      assert(reqLine == "POST /models/gemini-2.5-flash:generateContent")
      assert(headers.firstValue("x-goog-api-key").orElse("") == "fake-key-123")
      assert(headers.firstValue("Content-Type").orElse("").startsWith("application/json"))
      // the request body carries the prompt contract: fixed table name,
      // SELECT-only rule, schema grounding, and the question itself
      assert(reqBody.contains("data_table"))
      assert(reqBody.contains("Only SELECT"))
      assert(reqBody.contains("sales_rep: string"))
      assert(reqBody.contains("\\u54ea") || reqBody.contains("哪个销售卖得最好?"))
    }
  }

  test("model override from env reaches the URL") {
    withFake(200, geminiJson("SELECT 1")) { (base, seen) =>
      val gen = SqlGenerator.fromEnv(Map(
        "GEMINI_API_KEY" -> "k",
        "GRAFT_GEMINI_MODEL" -> "gemini-ultra-test",
        "GRAFT_GEMINI_ENDPOINT" -> base))
      assert(gen.generate("q", dinfo) == "SELECT 1")
      assert(seen.get()._1 == "POST /models/gemini-ultra-test:generateContent")
    }
  }

  test("unfenced responses pass through trimmed") {
    withFake(200, geminiJson("  SELECT 2\n")) { (base, _) =>
      val gen = new GeminiSqlGenerator("k", endpoint = base)
      assert(gen.generate("q", dinfo) == "SELECT 2")
    }
  }

  test("HTTP error surfaces the status code") {
    withFake(500, """{"error":{"message":"boom"}}""") { (base, _) =>
      val gen = new GeminiSqlGenerator("k", endpoint = base)
      val e = intercept[RuntimeException](gen.generate("q", dinfo))
      assert(e.getMessage.contains("500"))
    }
  }

  test("4xx (bad key) surfaces the status code, not a parse error") {
    withFake(403, """{"error":{"status":"PERMISSION_DENIED"}}""") { (base, _) =>
      val gen = new GeminiSqlGenerator("bad", endpoint = base)
      val e = intercept[RuntimeException](gen.generate("q", dinfo))
      assert(e.getMessage.contains("403"))
    }
  }

  test("malformed 200 body (no text part) fails loudly") {
    withFake(200, """{"candidates":[]}""") { (base, _) =>
      val gen = new GeminiSqlGenerator("k", endpoint = base)
      val e = intercept[IllegalArgumentException](gen.generate("q", dinfo))
      assert(e.getMessage.contains("no text part"))
    }
  }

  test("escaped JSON text (newlines, unicode) decodes before fence strip") {
    // text containing \n-separated SQL and a \uXXXX escape, exactly as
    // the API returns multi-line answers
    val body = """{"candidates":[{"content":{"parts":[{"text":"```sql\nSELECT 个 FROM data_table\n```"}]}}]}"""
    withFake(200, body) { (base, _) =>
      val gen = new GeminiSqlGenerator("k", endpoint = base)
      assert(gen.generate("q", dinfo) == "SELECT 个 FROM data_table")
    }
  }
}
