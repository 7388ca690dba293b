package graft.engine

/** Minimal multipart/form-data parser — just enough for the upload
  * endpoint's single file part (reference app.py:113–167 accepts one
  * `file` field per request). Byte-exact: bodies are binary (parquet,
  * xlsx), so the scan never round-trips through a string decode.
  */
object Multipart {

  /** Extract (filename, bytes) of the first file part, or None. */
  def firstFile(contentType: String, body: Array[Byte]): Option[(String, Array[Byte])] = {
    val boundary = contentType.split(";").map(_.trim)
      .find(_.startsWith("boundary="))
      .map(_.stripPrefix("boundary=").stripPrefix("\"").stripSuffix("\""))
      .getOrElse(return None)
    val delim = s"--$boundary".getBytes("ISO-8859-1")
    val crlf2 = "\r\n\r\n".getBytes("ISO-8859-1")
    var from = indexOf(body, delim, 0)
    while (from >= 0) {
      val headStart = from + delim.length
      val headEnd = indexOf(body, crlf2, headStart)
      if (headEnd < 0) return None
      val headers = new String(body, headStart, headEnd - headStart, "UTF-8")
      val fnameIdx = headers.indexOf("filename=\"")
      val bodyStart = headEnd + crlf2.length
      val next = indexOf(body, delim, bodyStart)
      if (next < 0) return None
      if (fnameIdx >= 0) {
        val fnEnd = headers.indexOf('"', fnameIdx + 10)
        val filename = headers.substring(fnameIdx + 10, fnEnd)
        // part body ends with \r\n before the next boundary
        val end = next - 2
        if (filename.nonEmpty && end > bodyStart)
          return Some((filename, java.util.Arrays.copyOfRange(body, bodyStart, end)))
      }
      from = next
      // terminal boundary "--boundary--"
      if (from + delim.length + 1 < body.length &&
          body(from + delim.length) == '-' && body(from + delim.length + 1) == '-')
        return None
    }
    None
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = from
    while (i <= hay.length - needle.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
