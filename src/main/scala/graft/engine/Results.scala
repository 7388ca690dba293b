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
