package graft.engine

import org.apache.spark.sql.DataFrame

/** Schema profile — the `data_info` analog (SURVEY.md §2 Tier A7;
  * /root/reference/doc.py:104–110): row/column counts, column names,
  * dtype strings, first 5 rows. This is both the UI "data overview" and
  * the LLM grounding context for NL→SQL (doc.py:174–182 analog).
  *
  * dtype strings use Spark's `DataType.simpleString` (`bigint`, `double`,
  * `string`) — the engine-native analog of pandas' `int64`/`object`.
  */
case class DataInfo(
    rowCount: Long,
    columnCount: Int,
    columns: Seq[String],
    dtypes: Map[String, String],
    head: Seq[Map[String, Any]])

object Profile {
  val HeadRows = 5

  def apply(df: DataFrame): DataInfo = {
    val names = df.columns.toSeq
    val dtypes = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val head = df.limit(HeadRows).collect().toSeq.map { row =>
      names.zipWithIndex.map { case (n, i) => n -> row.get(i) }.toMap
    }
    DataInfo(df.count(), names.length, names, dtypes, head)
  }
}
