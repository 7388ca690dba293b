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

  /** Per-column (null_count, approx_distinct) — beyond the reference's
    * data_info, the stats a data-pipeline profile needs. Computed in ONE
    * aggregation pass regardless of column count (2·N agg expressions,
    * map-side combined), so it scales like a single groupBy. */
  case class ColumnStats(nullCount: Long, approxDistinct: Long)

  def extended(df: DataFrame): Map[String, ColumnStats] = {
    import org.apache.spark.sql.functions._
    val names = df.columns.toSeq
    if (names.isEmpty) return Map.empty
    val aggs = names.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__n_$c"),
          approx_count_distinct(col(c)).as(s"__d_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    names.map { c =>
      c -> ColumnStats(
        Option(row.getAs[Any](s"__n_$c")).fold(0L)(_.asInstanceOf[Number].longValue),
        row.getAs[Long](s"__d_$c"))
    }.toMap
  }
}
