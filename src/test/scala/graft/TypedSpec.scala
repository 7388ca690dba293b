package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Dataset[T] surface (SURVEY.md §1.4: `Dataset[T]` where a case
  * class models the row): compile-time-checked field access, typed
  * filters, groupByKey + typed Aggregator — over the same parquet the
  * untyped operator library reads. */
case class TypedOrder(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double)

object MaxPrice extends Aggregator[TypedOrder, Double, Double] {
  def zero = Double.MinValue
  def reduce(b: Double, o: TypedOrder): Double = math.max(b, o.o_totalprice)
  def merge(a: Double, b: Double): Double = math.max(a, b)
  def finish(b: Double): Double = b
  def bufferEncoder = Encoders.scalaDouble
  def outputEncoder = Encoders.scalaDouble
}

class TypedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("typed Dataset: case-class reads, typed filter, groupByKey + Aggregator") {
    val orders: Dataset[TypedOrder] = ops.Tables.orders(spark, TestSpark.Sf)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[TypedOrder]

    val urgent = orders.filter(_.o_orderstatus == "F")
    assert(urgent.count() > 0)
    assert(urgent.head().o_orderstatus == "F")

    val maxByStatus = orders.groupByKey(_.o_orderstatus)
      .agg(MaxPrice.toColumn.name("max_price"))
      .collect().toMap
    // typed result agrees with the untyped aggregation
    val untyped = ops.Tables.orders(spark, TestSpark.Sf)
      .groupBy("o_orderstatus")
      .agg(org.apache.spark.sql.functions.max("o_totalprice").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(maxByStatus == untyped)
  }
}
