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
  * The probe reads `ts` as whatever physical type the source file
  * carries (nanos-as-long under the legacy flag for TIMESTAMP(NANOS)
  * generations, timestamp[us] for current ones) and writes replicas
  * with that same encoding — `Tables.events` adapts to either on
  * re-read (`Tables.normalizeTs`).
  *
  * Usage: runMain graft.tools.ScaleProbeEvents [sfDir] [outBase]
  */
object ScaleProbeEvents {

  private val Queries = Seq("q_events_tumbling", "q_events_sliding",
    "q_events_session", "q_events_dedup", "q_events_gapfill",
    "q_events_anomaly", "q_events_funnel", "q_events_bursts",
    // round-14 attribution: one user-partitioned window over the
    // stream (users grow K×, per-user history constant) — expected LINEAR
    "q_events_attribution",
    "q_asof_join", "q_asof_join_multi",
    // round 13c: EWMA — replicas offset user_id, so per-user sequence
    // length is constant across K; the window + grouped sum both hash
    // on user_id (work linear in rows)
    "q_events_ewma")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outBase = args.lift(1).getOrElse("/tmp/graft_scale_events")
    val spark = ProbeHarness.session()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    // the as-of join keys user_id against o_custkey, so both sides must
    // shift the SHARED key domain by one offset for joins to resolve
    // within a replica
    val uOff = math.max(
      ev.agg(max(col("user_id"))).head().getLong(0),
      ord.agg(max(col("o_custkey"))).head().getLong(0)) + 1
    val eOff = ev.agg(max(col("event_id"))).head().getLong(0) + 1
    val oOff = ord.agg(max(col("o_orderkey"))).head().getLong(0) + 1

    def replica(r: Int): DataFrame = ev
      .withColumn("user_id", col("user_id") + lit(r * uOff))
      .withColumn("event_id", col("event_id") + lit(r * eOff))
    def ordReplica(r: Int): DataFrame = ord
      .withColumn("o_custkey", col("o_custkey") + lit(r * uOff))
      .withColumn("o_orderkey", col("o_orderkey") + lit(r * oOff))

    ProbeHarness.run(spark, ProbeHarness.qs(Queries),
      ProbeHarness.ks(Seq(1, 4, 16, 64)), outBase, (k, dir) => {
        (0 until k).map(replica).reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/events.parquet")
        (0 until k).map(ordReplica).reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      })
  }
}
