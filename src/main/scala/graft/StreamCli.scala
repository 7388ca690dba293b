package graft

import graft.engine.Session
import graft.streaming.EventStream

/** CLI surface for the Structured Streaming pipelines: runs one pipeline
  * over a testdata directory's events.parquet (file-source stream, memory
  * sink, drained to completion) and prints the first rows.
  *
  * Usage: runMain graft.StreamCli <tumbling|sliding|session|dedup|join|replay> <sfDir>
  *
  * `replay` demos the Kafka-shaped log adapter end to end: snapshot the
  * events table into a partitioned-offset log, then run a consumer
  * written against Kafka's record columns over the replay stream.
  */
object StreamCli {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: graft.StreamCli <tumbling|sliding|session|dedup|join|replay> <sfDir>")
    val spark = Session.local("graft-stream-cli")
    if (args(0) == "replay") { runReplay(spark, args(1)); return }
    val (transform, mode) = args(0) match {
      case "tumbling" => (EventStream.tumbling _, "complete")
      case "sliding"  => (EventStream.sliding _, "complete")
      case "session"  => (EventStream.sessions _, "complete")
      case "dedup"    => (EventStream.dedup _, "append")
      case "join"     => (EventStream.viewToPurchase _, "append")
      case other      => throw new IllegalArgumentException(s"unknown pipeline: $other")
    }
    val q = transform(EventStream.source(spark, args(1)))
      .writeStream.format("memory").queryName("out").outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("out")
    println(s"rows=${out.count()}")
    out.orderBy(out.columns.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
      .show(10, truncate = false)
    spark.stop()
  }

  /** Kafka-shaped replay demo: events → partitioned-offset log →
    * streaming consumer (value-JSON parse + per-type totals). The
    * consumer half touches only Kafka's record columns, so the same
    * code would run against format("kafka") unchanged. */
  private def runReplay(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import graft.streaming.ReplaySource
    val logDir = java.nio.file.Files.createTempDirectory("graft_replay_cli").toString
    ReplaySource.snapshot(graft.ops.Tables.events(spark, sfDir), logDir,
      topic = "events", nPartitions = 4, keyCol = "user_id", tsCol = "ts",
      valueCols = Seq("event_id", "user_id", "event_type", "value"))
    val valueSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val q = ReplaySource.replayStream(spark, logDir, maxFilesPerTrigger = 2)
      .select(col("partition"), col("offset"),
        from_json(col("value").cast("string"), valueSchema).as("r"))
      .groupBy(col("r.event_type").as("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("r.value"), 2).as("total"))
      .writeStream.format("memory").queryName("replay_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("replay_out")
    println(s"log=$logDir rows=${out.count()}")
    out.orderBy("event_type").show(10, truncate = false)
    spark.stop()
  }
}
