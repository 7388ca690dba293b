package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.engine.Catalog
import graft.ops.Tables

/** Co-located joins via bucketing: both sides bucketed on the join key
  * with equal bucket counts → sort-merge join with NO Exchange — the
  * shuffle-free fact/fact join layout at scale. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("partitioned persistence prunes partitions at scan time") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString + "/orders_p"
    Catalog.partitionedPersist(
      Tables.orders(spark, TestSpark.Sf).select("o_orderkey", "o_totalprice", "o_orderstatus"),
      dir, "o_orderstatus")
    val scan = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("o_orderstatus"), s"expected partition pruning:\n$plan")
    assert(scan.count() ==
      Tables.orders(spark, TestSpark.Sf).filter(col("o_orderstatus") === "F").count())
  }

  test("bucketed fact/fact join plans without any shuffle") {
    Catalog.bucketedPersist(
      Tables.orders(spark, TestSpark.Sf).select("o_orderkey", "o_orderstatus"),
      "orders_bkt", "o_orderkey", 4)
    Catalog.bucketedPersist(
      Tables.lineitem(spark, TestSpark.Sf).select("l_orderkey", "l_quantity"),
      "lineitem_bkt", "l_orderkey", 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      val expected = Tables.lineitem(spark, TestSpark.Sf)
        .join(Tables.orders(spark, TestSpark.Sf),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
