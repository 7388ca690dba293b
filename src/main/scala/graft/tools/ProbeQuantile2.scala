package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only follow-up probe: WHY is the (flag, price) histogram 7× the
  * (flag, qty) one when partial aggregation collapses both to ≤1.5M
  * groups? Variants isolate the group-key width, the table-cache read
  * path, and the partial-agg hash-map regime. */
object ProbeQuantile2 {
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
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-40s min=${ts.min}%.3f s (3 reps)")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val cached = graft.ops.Tables.lineitem(spark, sfDir)
    cached.count()
    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")

    time("cached (flag, price-dbl) hist") {
      noop(cached.groupBy(col("l_returnflag"),
        col("l_extendedprice").cast("double")).agg(count(lit(1))))
    }
    time("raw parquet (flag, price-dbl) hist") {
      noop(raw.groupBy(col("l_returnflag"),
        col("l_extendedprice").cast("double")).agg(count(lit(1))))
    }
    time("raw parquet (price-dbl) hist, no flag") {
      noop(raw.groupBy(col("l_extendedprice").cast("double")).agg(count(lit(1))))
    }
    time("raw parquet (flag, price DECIMAL) hist") {
      noop(raw.groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(count(lit(1))))
    }
    time("raw parquet (flag, price-as-LONG cents)") {
      noop(raw.groupBy(col("l_returnflag"),
        (col("l_extendedprice") * 100).cast("long")).agg(count(lit(1))))
    }
    time("raw, partialagg skipped (repartition first)") {
      noop(raw.select(col("l_returnflag"), col("l_extendedprice").cast("double").as("v"))
        .repartition(col("l_returnflag"), col("v"))
        .groupBy("l_returnflag", "v").agg(count(lit(1))))
    }
    spark.stop()
  }
}
