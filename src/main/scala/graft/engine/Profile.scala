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

  /** DuckDB-`SUMMARIZE`-shaped per-column profile (round 13: the
    * gateway accepts `SUMMARIZE <table|SELECT …>` and routes here). One
    * aggregation pass regardless of column count — up to 10 agg
    * expressions per column, map-side combined — then one bounded
    * O(#columns) driver materialization, the same contract as the
    * reference's data_info profile. Quartiles/avg/std are NULL for
    * non-numeric columns (DuckDB's convention); min/max are rendered as
    * strings so one output schema fits every column type. */
  def summarize(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val fields = df.schema.fields
    val outSchema = StructType(Seq(
      StructField("column_name", StringType, nullable = false),
      StructField("column_type", StringType, nullable = false),
      StructField("min", StringType),
      StructField("max", StringType),
      StructField("approx_unique", LongType),
      StructField("avg", DoubleType),
      StructField("std", DoubleType),
      StructField("q25", DoubleType),
      StructField("q50", DoubleType),
      StructField("q75", DoubleType),
      StructField("count", LongType),
      StructField("null_percentage", DoubleType)))
    if (fields.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], outSchema)
    val aggs = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Column](
      count(lit(1)).as("__rows"))
    fields.zipWithIndex.foreach { case (f, i) =>
      val c = col(df.columns(i))
      aggs += min(c).cast("string").as(s"mn_$i")
      aggs += max(c).cast("string").as(s"mx_$i")
      aggs += approx_count_distinct(c).as(s"au_$i")
      aggs += count(c).as(s"ct_$i")
      if (f.dataType.isInstanceOf[NumericType]) {
        aggs += avg(c).cast("double").as(s"av_$i")
        aggs += stddev_samp(c).cast("double").as(s"sd_$i")
        aggs += percentile_approx(c.cast("double"), lit(0.25), lit(1000)).as(s"q1_$i")
        aggs += percentile_approx(c.cast("double"), lit(0.5), lit(1000)).as(s"q2_$i")
        aggs += percentile_approx(c.cast("double"), lit(0.75), lit(1000)).as(s"q3_$i")
      }
    }
    val r = df.agg(aggs.head, aggs.tail.toSeq: _*).collect()(0)
    val rows = r.getAs[Long]("__rows")
    def d(name: String): Any =
      if (r.schema.fieldNames.contains(name)) r.getAs[Any](name) else null
    val out = fields.zipWithIndex.map { case (f, i) =>
      val nonNull = r.getAs[Long](s"ct_$i")
      Row(f.name, f.dataType.simpleString,
        r.getAs[String](s"mn_$i"), r.getAs[String](s"mx_$i"),
        r.getAs[Long](s"au_$i"),
        d(s"av_$i"), d(s"sd_$i"), d(s"q1_$i"), d(s"q2_$i"), d(s"q3_$i"),
        nonNull,
        if (rows == 0L) 0.0
        else math.rint((rows - nonNull).toDouble / rows * 10000) / 100)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toIndexedSeq, 1), outSchema)
  }

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
