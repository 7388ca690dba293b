package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe (VERDICT r19 item 3): q_agg_count_distinct runs two
  * COUNT(DISTINCT) columns in one aggregate, which Spark plans through
  * Expand — every input row duplicates once per distinct aggregate, so
  * the 60M-row sf10 stream becomes 120M rows before the first shuffle
  * (4.7 s solo vs DuckDB 1.24 s). Variants:
  *  A. baseline: one agg, two countDistinct (Expand ×2);
  *  B. two independent distinct aggregates joined on the group key —
  *     each scans once but never doubles, and the distinct pre-agg is
  *     map-side combinable;
  *  C. same as B but off one shared scan via a cached projection.
  */
object ProbeCountDistinct {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val spark = { graft.engine.Session.pinLocale(); SparkSession.builder() }
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-44s min=${ts.min}%.3f s (3 reps)")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = graft.ops.Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_suppkey", "l_orderkey")
    li.count() // warm cache

    time("A baseline: one agg, 2x countDistinct") {
      noop(li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
             countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy("l_returnflag"))
    }
    time("B two single-distinct aggs, joined") {
      val a = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"))
      val b = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("n_orders"))
      noop(a.join(b, Seq("l_returnflag")).orderBy("l_returnflag"))
    }
    time("C explicit two-level (distinct pairs then count)") {
      val a = li.select("l_returnflag", "l_suppkey").distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_supp"))
      val b = li.select("l_returnflag", "l_orderkey").distinct()
        .groupBy("l_returnflag").agg(count(lit(1)).as("n_orders"))
      noop(a.join(b, Seq("l_returnflag")).orderBy("l_returnflag"))
    }
    spark.stop()
  }
}
