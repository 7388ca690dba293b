package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (DuckDB `ASOF JOIN`; SURVEY.md §2 "Joins").
  *
  * For each left row, find the most recent right row of the same key
  * with rightTime <= leftTime. Spark has no builtin; the naive
  * emulation (range join + per-row top-1 window) materializes
  * |left| × |matching rights| intermediate rows — quadratic per key.
  *
  * This implementation is the merge formulation: union both sides
  * tagged, shuffle ONCE by key, sort within key by (time, side), and
  * carry the latest right value forward with a running last_value
  * window. Cost is one shuffle + one sort of |left| + |right| — the
  * same shape as a sort-merge join, which is what a 100 TB as-of join
  * must be.
  *
  * `rightValue` is the single right-side payload column carried to the
  * output (generalizing to a struct covers multiple columns).
  */
object AsOf {

  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightValue: String, outName: String): DataFrame = {

    val l = left.withColumn("_k", col(leftKey))
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))           // left sorts after right at equal times
      .withColumn("_rv", lit(null).cast(right.schema(rightValue).dataType))
    val r = right.select(
      col(rightKey).as("_k"), col(rightTime).as("_t"),
      lit(0).as("_side"), col(rightValue).as("_rv"))

    val unioned = l.select((left.columns.map(col) ++
      Seq(col("_k"), col("_t"), col("_side"), col("_rv"))).toIndexedSeq: _*)
      .unionByName(r.select((left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("_k"), col("_t"), col("_side"), col("_rv"))).toIndexedSeq: _*))

    // right rows sort before left rows at the same (key, time): an event
    // AT an order's timestamp matches that order (ts >= o_time semantics)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn(outName, last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_k", "_t", "_side", "_rv")
  }
}
