package graft.engine

/** Minimal JSON encode/decode for the web layer's flat payloads.
  *
  * The API surface (reference app.py:109–275) only ever exchanges flat
  * objects of strings/numbers, so a full JSON library isn't warranted
  * (and none is in the dependency set). Encoding escapes every control
  * character; decoding handles exactly the flat-object string-field case
  * the endpoints need.
  */
object Json {

  /** JSON string literal with full control-character escaping. */
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** `{"k":v,...}` — values must already be JSON-encoded. */
  def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => s"${str(k)}:$v" }.mkString("{", ",", "}")

  def arr(items: Seq[String]): String = items.mkString("[", ",", "]")

  /** Read a top-level string field from a flat JSON object; None when
    * the key is absent or not a string. */
  def getString(json: String, key: String): Option[String] = {
    val k = json.indexOf(str(key))
    if (k < 0) return None
    val colon = json.indexOf(':', k + str(key).length)
    if (colon < 0) return None
    var i = colon + 1
    while (i < json.length && json.charAt(i).isWhitespace) i += 1
    if (i >= json.length || json.charAt(i) != '"') return None
    i += 1
    val sb = new StringBuilder
    while (i < json.length && json.charAt(i) != '"') {
      json.charAt(i) match {
        case '\\' if i + 1 < json.length =>
          json.charAt(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 'u' if i + 5 < json.length =>
              sb += Integer.parseInt(json.substring(i + 2, i + 6), 16).toChar
              i += 6
            case c => sb += c; i += 2
          }
        case c => sb += c; i += 1
      }
    }
    Some(sb.toString)
  }
}
