package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Tables._

/** Dev-only micro-probe (round 19): isolates where the exact-quantile
  * family's residual time goes after the histogram rewrite — the
  * approximate-sketch branch (Spark's built-in GK `percentile_approx`
  * vs the native KLL TypedImperativeAggregate) vs the histogram scan
  * itself vs the moments scan. Drives the q_agg_approx_quantile /
  * q_agg_stats plan decisions; numbers in BENCH_NOTES round 19.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.tools.ProbeQuantile
  */
object ProbeQuantile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = { graft.engine.Session.pinLocale(); SparkSession.builder() }
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-36s min=${ts.min}%.3f s (3 reps)")
    }

    val li = lineitem(spark, sfDir)
    li.count() // table cache warm
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("gk percentile_approx acc=1000") {
      noop(li.groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)),
             percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000))))
    }
    time("gk percentile_approx array acc=1000") {
      noop(li.groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"), array(lit(0.5), lit(0.99)),
          lit(1000))))
    }
    time("kll sketch agg + 2 quantiles") {
      import graft.functions.SketchExprs
      noop(li.groupBy("l_returnflag")
        .agg(SketchExprs.kllSketchAgg(col("l_extendedprice").cast("double")).as("sk"))
        .select(SketchExprs.kllQuantile(col("sk"), 0.5),
                SketchExprs.kllQuantile(col("sk"), 0.99)))
    }
    time("value histogram (price)") {
      noop(li.groupBy(col("l_returnflag"),
        col("l_extendedprice").cast("double")).agg(count(lit(1))))
    }
    time("value histogram (qty)") {
      noop(li.groupBy(col("l_returnflag"),
        col("l_quantity").cast("double")).agg(count(lit(1))))
    }
    time("tagged 2-measure histogram (1 scan)") {
      noop(li.select(col("l_returnflag").as("g"), explode(array(
          struct(lit("q").as("m"), col("l_quantity").cast("double").as("v")),
          struct(lit("p").as("m"), col("l_extendedprice").cast("double").as("v"))))
          .as("p"))
        .select(col("g"), col("p.m").as("m"), col("p.v").as("v"))
        .groupBy("g", "m", "v").agg(count(lit(1))))
    }
    time("moments scan (stddev/var discount)") {
      noop(li.groupBy("l_returnflag")
        .agg(round(stddev_samp(col("l_discount")), 6),
             round(var_samp(col("l_discount")), 6)))
    }
    spark.stop()
  }
}
