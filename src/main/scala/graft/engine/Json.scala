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
    * the key is absent or not a string.
    *
    * Walks the object key by key (tracking string/escape state and
    * skipping nested values whole) instead of substring-searching, so a
    * key name occurring inside a string VALUE — e.g. a question whose
    * text mentions "file_id" — can never be mistaken for the field. */
  def getString(json: String, key: String): Option[String] = {
    val n = json.length
    var i = 0
    def skipWs(): Unit = while (i < n && json.charAt(i).isWhitespace) i += 1
    // decode the string starting at the opening quote json(i); leaves i
    // just past the closing quote
    def readString(): String = {
      i += 1
      val sb = new StringBuilder
      while (i < n && json.charAt(i) != '"') {
        json.charAt(i) match {
          case '\\' if i + 1 < n =>
            json.charAt(i + 1) match {
              case 'n' => sb += '\n'; i += 2
              case 't' => sb += '\t'; i += 2
              case 'r' => sb += '\r'; i += 2
              case 'b' => sb += '\b'; i += 2
              case 'f' => sb += '\f'; i += 2
              // malformed \uXXXX (non-hex / truncated) falls through to
              // the literal-char case instead of throwing — getString
              // must return None/other fields, never escape an exception
              case 'u' if i + 5 < n &&
                json.substring(i + 2, i + 6).forall(c =>
                  Character.digit(c, 16) >= 0) =>
                sb += Integer.parseInt(json.substring(i + 2, i + 6), 16).toChar
                i += 6
              case c => sb += c; i += 2
            }
          case c => sb += c; i += 1
        }
      }
      i += 1
      sb.toString
    }
    // skip one value of any type (string / object / array / literal)
    def skipValue(): Unit = {
      skipWs()
      if (i >= n) return
      json.charAt(i) match {
        case '"' => readString(); ()
        case '{' | '[' =>
          var depth = 0
          var done = false
          while (i < n && !done) {
            json.charAt(i) match {
              case '"' => readString()
              case '{' | '[' => depth += 1; i += 1
              case '}' | ']' => depth -= 1; i += 1; if (depth == 0) done = true
              case _ => i += 1
            }
          }
        case _ =>
          while (i < n && !",}]".contains(json.charAt(i))) i += 1
      }
    }
    skipWs()
    if (i >= n || json.charAt(i) != '{') return None
    i += 1
    while (i < n) {
      skipWs()
      if (i >= n) return None
      json.charAt(i) match {
        case '}' => return None
        case ',' => i += 1
        case '"' =>
          val k = readString()
          skipWs()
          if (i >= n || json.charAt(i) != ':') return None
          i += 1
          skipWs()
          if (k == key)
            return if (i < n && json.charAt(i) == '"') Some(readString()) else None
          else skipValue()
        case _ => return None // malformed
      }
    }
    None
  }

  /** Read a top-level array-of-strings field from a flat JSON object;
    * None when the key is absent or not an array. Non-string array
    * elements are skipped. Same key-by-key walk as [[getString]], so a
    * key name inside a string value can never be mistaken for the field.
    * Implemented by locating the raw value with the getString machinery's
    * rules, then decoding the element strings. */
  def getStringArray(json: String, key: String): Option[Seq[String]] = {
    val n = json.length
    var i = 0
    def skipWs(): Unit = while (i < n && json.charAt(i).isWhitespace) i += 1
    def readString(): String = {
      i += 1
      val sb = new StringBuilder
      while (i < n && json.charAt(i) != '"') {
        json.charAt(i) match {
          case '\\' if i + 1 < n =>
            json.charAt(i + 1) match {
              case 'n' => sb += '\n'; i += 2
              case 't' => sb += '\t'; i += 2
              case 'r' => sb += '\r'; i += 2
              case 'b' => sb += '\b'; i += 2
              case 'f' => sb += '\f'; i += 2
              case 'u' if i + 5 < n &&
                json.substring(i + 2, i + 6).forall(c =>
                  Character.digit(c, 16) >= 0) =>
                sb += Integer.parseInt(json.substring(i + 2, i + 6), 16).toChar
                i += 6
              case c => sb += c; i += 2
            }
          case c => sb += c; i += 1
        }
      }
      i += 1
      sb.toString
    }
    def skipValue(): Unit = {
      skipWs()
      if (i >= n) return
      json.charAt(i) match {
        case '"' => readString(); ()
        case '{' | '[' =>
          var depth = 0
          var done = false
          while (i < n && !done) {
            json.charAt(i) match {
              case '"' => readString()
              case '{' | '[' => depth += 1; i += 1
              case '}' | ']' => depth -= 1; i += 1; if (depth == 0) done = true
              case _ => i += 1
            }
          }
        case _ =>
          while (i < n && !",}]".contains(json.charAt(i))) i += 1
      }
    }
    skipWs()
    if (i >= n || json.charAt(i) != '{') return None
    i += 1
    while (i < n) {
      skipWs()
      if (i >= n) return None
      json.charAt(i) match {
        case '}' => return None
        case ',' => i += 1
        case '"' =>
          val k = readString()
          skipWs()
          if (i >= n || json.charAt(i) != ':') return None
          i += 1
          skipWs()
          if (k == key) {
            if (i >= n || json.charAt(i) != '[') return None
            i += 1
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var done = false
            while (i < n && !done) {
              skipWs()
              if (i < n) json.charAt(i) match {
                case ']' => i += 1; done = true
                case ',' => i += 1
                case '"' => out += readString()
                case _ => skipValue()
              }
            }
            return Some(out.toSeq)
          } else skipValue()
        case _ => return None // malformed
      }
    }
    None
  }
}
