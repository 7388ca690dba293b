package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: empirical scaling evidence for the EVENTS family — the
  * third probe alongside [[ScaleProbe]] (dedup/corpus over documents)
  * and [[ScaleProbeRel]] (relational over the fact tables).
  *
  * Replica r offsets `user_id` and `event_id` by r·(max+1) and keeps
  * timestamps unchanged: every windowed shape (tumbling/sliding
  * aggregation, session assembly, dedup, gap-fill, burst/funnel/
  * anomaly) partitions by user or event key, so replicas are
  * independent, per-user series sizes stay constant, and true work
  * grows linearly in K (64× ≈ 6.4M events).
  *
  * The events parquet carries TIMESTAMP(NANOS); the probe reads it
  * nanos-as-long, so replicas are written with a plain INT64 `ts` —
  * `Tables.events` accepts either encoding (it truncates raw nanos to
  * µs itself).
  *
  * Usage: runMain graft.tools.ScaleProbeEvents [sfDir] [outBase]
  */
object ScaleProbeEvents {

  private val Queries = Seq("q_events_tumbling", "q_events_sliding",
    "q_events_session", "q_events_dedup", "q_events_gapfill",
    "q_events_anomaly", "q_events_funnel", "q_events_bursts")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outBase = args.lift(1).getOrElse("/tmp/graft_scale_events")
    val spark = { graft.engine.Session.pinLocale(); SparkSession.builder() }
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val uOff = ev.agg(max(col("user_id"))).head.getLong(0) + 1
    val eOff = ev.agg(max(col("event_id"))).head.getLong(0) + 1

    def replica(r: Int): DataFrame = ev
      .withColumn("user_id", col("user_id") + lit(r * uOff))
      .withColumn("event_id", col("event_id") + lit(r * eOff))

    val ks = Seq(1, 4, 16, 64)
    ks.foreach { k =>
      (0 until k).map(replica).reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$outBase/k$k/events.parquet")
    }

    def timeOnce(name: String, dir: String): Double = {
      System.err.println(s"[probe] $name @ $dir")
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    Queries.foreach(q => timeOnce(q, s"$outBase/k1")) // untimed JIT warmup
    val results = ks.map { k =>
      spark.sharedState.cacheManager.clearCache()
      k -> Queries.map(q => q -> timeOnce(q, s"$outBase/k$k")).toMap
    }
    println(f"${"query"}%-22s" + ks.map(k => f"K=$k%-7d").mkString)
    Queries.foreach { q =>
      println(f"$q%-22s" + results.map { case (_, m) => f"${m(q)}%-7.2f" }.mkString)
    }
    val totals = results.map { case (k, m) => k -> m.values.sum }
    println(f"${"TOTAL"}%-22s" + totals.map { case (_, t) => f"$t%-7.2f" }.mkString)
    val (t1, tLast) = (totals.head._2, totals.last._2)
    println(f"${ks.last}x data => ${tLast / t1}%.2fx time (linear=${ks.last}; " +
      "sub-linear reflects the fixed per-query floor)")
    spark.stop()
  }
}
