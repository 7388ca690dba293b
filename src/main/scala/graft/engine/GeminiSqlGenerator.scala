package graft.engine

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Production NL→SQL transport: the Gemini `generateContent` REST call
  * behind the [[SqlGenerator]] seam (reference /root/reference/doc.py:193–203,
  * model gemini-2.5-flash; prompt contract doc.py:172–190 via
  * [[SqlGenerator.buildPrompt]]).
  *
  * This class is the *wiring shape* only: it compiles and is the one-line
  * swap-in for deployments with egress (`new GeminiSqlGenerator(key)`),
  * but it is never constructed by tests or the CLI — this build
  * environment is zero-egress, so [[SqlGenerator.Stub]] stays the
  * default (SURVEY.md §7.4-3).
  *
  * Transport is JDK-builtin `java.net.http` — no added dependencies.
  */
final class GeminiSqlGenerator(
    apiKey: String,
    private[graft] val model: String = "gemini-2.5-flash",
    private[graft] val endpoint: String = "https://generativelanguage.googleapis.com/v1beta",
    timeout: Duration = Duration.ofSeconds(30)) extends SqlGenerator {

  private lazy val http: HttpClient =
    HttpClient.newBuilder().connectTimeout(timeout).build()

  override def generate(question: String, info: DataInfo, table: String): String =
    complete(SqlGenerator.buildPrompt(question, info, table))

  override def generateMulti(question: String,
      tables: Seq[(String, DataInfo)]): String = tables match {
    case Seq((t, info)) => generate(question, info, t)
    case _ => complete(SqlGenerator.buildPromptMulti(question, tables))
  }

  private def complete(prompt: String): String = {
    val body = s"""{"contents":[{"parts":[{"text":${jsonString(prompt)}}]}]}"""
    val req = HttpRequest.newBuilder()
      .uri(URI.create(s"$endpoint/models/$model:generateContent"))
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .header("x-goog-api-key", apiKey)
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"Gemini API call failed: HTTP ${resp.statusCode()}")
    stripFences(firstCandidateText(resp.body()))
  }

  /** Minimal JSON string literal encoder (string payloads only — the
    * request body has no other dynamic parts). */
  private def jsonString(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }.mkString("\"", "", "\"")

  /** Extract candidates[0].content.parts[0].text from the response JSON.
    * A targeted scan (find the first `"text"` key and decode its string
    * value) — the response schema is fixed and no JSON library is in the
    * dependency set. */
  private[graft] def firstCandidateText(json: String): String = {
    val key = "\"text\""
    val k = json.indexOf(key)
    require(k >= 0, "Gemini response had no text part")
    var i = json.indexOf('"', json.indexOf(':', k + key.length) + 1) + 1
    val sb = new StringBuilder
    while (i < json.length && json.charAt(i) != '"') {
      json.charAt(i) match {
        case '\\' =>
          json.charAt(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 'u' =>
              sb += Integer.parseInt(json.substring(i + 2, i + 6), 16).toChar
              i += 6
            case c => sb += c; i += 2
          }
        case c => sb += c; i += 1
      }
    }
    sb.toString
  }

  /** Models wrap SQL in ```sql fences; the gateway wants bare SQL
    * (reference strips them in doc.py's post-processing). */
  private[graft] def stripFences(s: String): String = {
    val t = s.trim
    if (!t.startsWith("```")) t
    else t.stripPrefix("```sql").stripPrefix("```").trim.stripSuffix("```").trim
  }
}
