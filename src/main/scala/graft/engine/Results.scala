package graft.engine

import org.apache.spark.sql.DataFrame

/** Result materialization + markdown rendering (SURVEY.md §2 Tier A11/A12).
  *
  * Materialization mirrors /root/reference/doc.py:251–260 (columns +
  * row-oriented records + row_count); rendering mirrors the display rules
  * of /root/reference/app.py:81–99: cap 10 rows, floats to 2 decimal
  * places, integers with thousands separators, null → "null", strings
  * truncated at 50 chars with an ellipsis.
  *
  * `collect()` here is the *display* boundary, deliberately bounded by
  * `DisplayCap` — operators themselves never collect (SURVEY.md §4.3).
  */
case class QueryResult(columns: Seq[String], rows: Seq[Seq[Any]], rowCount: Long)

object Results {
  val DisplayCap = 10
  val StringCap = 50

  /** Bounded materialization: up to `limit` rows plus the true count. */
  def materialize(df: DataFrame, limit: Int = 10000): QueryResult = {
    val rows = df.limit(limit).collect().toSeq.map(_.toSeq)
    val n = if (rows.length < limit) rows.length.toLong else df.count()
    QueryResult(df.columns.toSeq, rows, n)
  }

  // Locale.ROOT pins '.'-decimal and ','-grouping regardless of the
  // JVM default locale (the reference's display rules are fixed).
  private def fmt(pattern: String, v: Any): String =
    String.format(java.util.Locale.ROOT, pattern, v.asInstanceOf[AnyRef])

  def formatCell(v: Any): String = v match {
    case null                   => "null"
    case d: Double              => fmt("%.2f", d)
    case f: Float               => fmt("%.2f", f.toDouble)
    case d: java.math.BigDecimal => fmt("%.2f", d.doubleValue())
    case i: Int                 => fmt("%,d", i)
    case l: Long                => fmt("%,d", l)
    case s: String              => if (s.length > StringCap) s.take(StringCap) + "..." else s
    case other                  => other.toString
  }

  /** Auto-chart (reference roadmap README:102 "可视化图表"): a
    * self-contained inline SVG horizontal bar chart when the result has
    * the classic label+measure shape — first column as the label, first
    * NUMERIC column as the measure, ≥2 rows, every charted measure
    * non-null and finite. Like the table, the chart shows the FIRST
    * DisplayCap rows (an aggregate result is conventionally ORDER BY
    * measure DESC, so these are the top-10; the title says so). None
    * otherwise — charting is opportunistic, never a failure path. No CDN chart lib can exist in a zero-egress
    * deployment, so the server renders the SVG itself; labels are
    * XML-escaped here (data is untrusted — the web UI injects this
    * string as markup). Negative values draw from a shared baseline. */
  def toSvgChart(r0: QueryResult): Option[String] = {
    val r = r0.copy(rows = r0.rows.take(DisplayCap))
    if (r.rows.size < 2 || r.columns.size < 2) return None
    def num(v: Any): Option[Double] = v match {
      case d: Double => Some(d)
      case f: Float => Some(f.toDouble)
      case i: Int => Some(i.toDouble)
      case l: Long => Some(l.toDouble)
      case s: Short => Some(s.toDouble)
      case b: java.math.BigDecimal => Some(b.doubleValue())
      case d: BigDecimal => Some(d.toDouble)
      case _ => None
    }
    val vIdx = (1 until r.columns.size).find(i => r.rows.forall(row =>
      num(row(i)).exists(d => !d.isNaN && !d.isInfinite))).getOrElse(return None)
    def esc(s: String): String = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    val labels = r.rows.map(row => esc(formatCell(row.head)))
    val values = r.rows.map(row => num(row(vIdx)).get)
    val maxAbs = math.max(values.map(math.abs).max, 1e-12)
    val (rowH, chartW, labelW) = (22, 360, 140)
    val h = r.rows.size * rowH + 24
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="${labelW + chartW + 70}" height="$h" font-family="sans-serif" font-size="11">"""
    val suffix = if (r0.rowCount > DisplayCap) s" (first $DisplayCap of ${r0.rowCount})" else ""
    sb ++= s"""<text x="0" y="12" font-weight="bold">${esc(r.columns(vIdx))} by ${esc(r.columns.head)}$suffix</text>"""
    values.zipWithIndex.foreach { case (v, i) =>
      val y = 20 + i * rowH
      val w = math.max(1, (math.abs(v) / maxAbs * chartW).round.toInt)
      sb ++= s"""<text x="${labelW - 6}" y="${y + 14}" text-anchor="end">${labels(i)}</text>"""
      sb ++= s"""<rect x="$labelW" y="${y + 3}" width="$w" height="${rowH - 8}" fill="${if (v < 0) "#c0504d" else "#4a7ebb"}"/>"""
      sb ++= s"""<text x="${labelW + w + 4}" y="${y + 14}">${esc(formatCell(r.rows(i)(vIdx)))}</text>"""
    }
    sb ++= "</svg>"
    Some(sb.toString)
  }

  /** GitHub-style markdown table with the reference's display rules. */
  def toMarkdown(r: QueryResult): String = {
    val sb = new StringBuilder
    sb.append(r.columns.mkString("| ", " | ", " |")).append('\n')
    sb.append(r.columns.map(_ => "---").mkString("| ", " | ", " |")).append('\n')
    r.rows.take(DisplayCap).foreach { row =>
      sb.append(row.map(formatCell).mkString("| ", " | ", " |")).append('\n')
    }
    if (r.rowCount > DisplayCap)
      sb.append(s"\n*showing first $DisplayCap of ${r.rowCount} rows*\n")
    sb.toString
  }
}
