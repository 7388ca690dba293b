package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe 3: can the (flag, price) histogram's partial agg be
  * made fast WITHOUT giving up map-side combining (the 100 TB shuffle
  * reduction)? Variants: composite single-LONG group key (narrow
  * UnsafeRow, cheap equality) and the codegen fast-hash-map capacity
  * knob. */
object ProbeQuantile3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val capacityBit = sys.env.getOrElse("GRAFT_PROBE_CAPBIT", "16")
    val spark = { graft.engine.Session.pinLocale(); SparkSession.builder() }
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.aggregate.fastHashMap.capacityBit", capacityBit)
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

    val raw = spark.read.parquet(s"$sfDir/lineitem.parquet")
    raw.count()
    println(s"capacityBit=$capacityBit")

    // flag → 2 bits, cents ≤ ~2^24 → one long key
    val flagIdx = when(col("l_returnflag") === "A", 0L)
      .when(col("l_returnflag") === "N", 1L).otherwise(2L)
    val k = ((col("l_extendedprice") * 100).cast("long") * 4) + flagIdx
    time("composite LONG key hist") {
      noop(raw.groupBy(k.as("k")).agg(count(lit(1))))
    }
    time("baseline (flag, price-dbl) hist") {
      noop(raw.groupBy(col("l_returnflag"),
        col("l_extendedprice").cast("double")).agg(count(lit(1))))
    }
    spark.stop()
  }
}
