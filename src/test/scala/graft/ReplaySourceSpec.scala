package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Tables
import graft.streaming.ReplaySource

/** Kafka-shaped file replay (streaming/ReplaySource): the adapter must
  * honor the parts of the Kafka contract a consumer observes — record
  * schema, dense per-partition offsets, stable key→partition mapping,
  * stream/batch agreement, and exactly-once resume from a checkpoint. */
class ReplaySourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val logDir = {
    val dir = java.nio.file.Files.createTempDirectory("graft_replay").toString
    ReplaySource.snapshot(
      Tables.events(spark, TestSpark.Sf), dir, "events", nPartitions = 4,
      keyCol = "user_id", tsCol = "ts",
      valueCols = Seq("event_id", "user_id", "event_type", "value"))
    dir
  }

  test("replay log carries Kafka's record schema") {
    val log = ReplaySource.replayBatch(spark, logDir)
    val expect = ReplaySource.KafkaShape.fields.map(f => f.name -> f.dataType).toSeq
    assert(log.schema.fields.map(f => f.name -> f.dataType).toSeq == expect,
      log.schema.treeString)
  }

  test("offsets are dense per partition from 0; keys map to one partition") {
    val log = ReplaySource.replayBatch(spark, logDir).cache()
    val perPart = log.groupBy("partition").agg(
      count(lit(1)).as("n"), min("offset").as("lo"), max("offset").as("hi"),
      countDistinct("offset").as("nd")).collect()
    assert(perPart.nonEmpty && perPart.length <= 4)
    perPart.foreach { r =>
      assert(r.getLong(2) == 0L, s"offset must start at 0: $r")
      assert(r.getLong(3) == r.getLong(1) - 1, s"offset must be dense: $r")
      assert(r.getLong(4) == r.getLong(1), s"offsets must be unique: $r")
    }
    // a key lives on exactly one partition (keyed-consumer ordering)
    val spread = log.groupBy("key").agg(countDistinct("partition").as("np"))
      .agg(max("np")).head().getLong(0)
    assert(spread == 1L, s"a key crossed partitions: $spread")
    // and two snapshots of the same input are the same log (determinism)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_replay2").toString
    ReplaySource.snapshot(
      Tables.events(spark, TestSpark.Sf), dir2, "events", nPartitions = 4,
      keyCol = "user_id", tsCol = "ts",
      valueCols = Seq("event_id", "user_id", "event_type", "value"))
    val again = ReplaySource.replayBatch(spark, dir2)
    assert(log.exceptAll(again).isEmpty && again.exceptAll(log).isEmpty)
    log.unpersist()
    ()
  }

  test("a Kafka-style consumer over the replay stream equals batch") {
    // the canonical consumer shape: cast value, from_json, aggregate —
    // written against the Kafka columns only, nothing replay-specific
    val valueSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    def consumer(df: org.apache.spark.sql.DataFrame) = df
      .select(from_json(col("value").cast("string"), valueSchema).as("r"))
      .groupBy(col("r.event_type").as("event_type"))
      .agg(count(lit(1)).as("n"), sum("r.value").as("total"))
    val q = consumer(ReplaySource.replayStream(spark, logDir, maxFilesPerTrigger = 2))
      .writeStream.format("memory").queryName("replay_consumer")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("replay_consumer")
    val batch = consumer(ReplaySource.replayBatch(spark, logDir))
    val sa = streamed.collect().map(_.toString).sorted.toSeq
    val sb = batch.collect().map(_.toString).sorted.toSeq
    assert(sa == sb, s"stream vs batch: ${sa.size} vs ${sb.size}")
  }

  test("checkpointed replay is exactly-once across a restart") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft_replay_ck").toString
    val seen = new java.util.concurrent.atomic.AtomicLong(0L)
    def run(): Long = {
      seen.set(0L)
      val q = ReplaySource.replayStream(spark, logDir, maxFilesPerTrigger = 1)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.addAndGet(b.count()); ()
        }
        .start()
      q.processAllAvailable()
      q.stop()
      seen.get()
    }
    val total = ReplaySource.replayBatch(spark, logDir).count()
    assert(run() == total, "first run must replay the whole log")
    // the file source committed every file to the checkpoint: a restart
    // replays NOTHING — the committed-consumer-offset behavior
    assert(run() == 0L, "restart after full consumption must emit no rows")
  }
}
