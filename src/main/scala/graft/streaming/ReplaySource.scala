package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-shaped partitioned-offset file replay (round 16 — the
  * reference's roadmap names Kafka/Redis real-time sources,
  * README.md:110; no Kafka client exists offline, so this closes the
  * SHAPE: a durable, partitioned, offset-addressed log replayed through
  * Structured Streaming with Kafka's exact record schema, so a pipeline
  * written against `spark.readStream.format("kafka")` runs unchanged on
  * a file-backed replay and vice versa).
  *
  * Contract (the part of Kafka that matters to a consumer):
  *  - records are (key, value) byte arrays plus (topic, partition,
  *    offset, timestamp, timestampType) — the columns Spark's Kafka
  *    source exposes, same names and types;
  *  - per (topic, partition) the offset is a dense total order starting
  *    at 0 — replay preserves it;
  *  - a key maps to a stable partition (hash % n), so per-key order is
  *    per-partition order — the property every keyed consumer relies on;
  *  - resume: Structured Streaming's file source tracks consumed files
  *    in the checkpoint, giving exactly-once replay across restarts —
  *    the file analog of committed consumer offsets.
  *
  * At 100 TB the layout is the point: the log directory is written
  * `partitionBy("partition")`, so a downstream `groupBy(partition)` or
  * keyed stateful op reads co-located files, and `maxFilesPerTrigger`
  * bounds each micro-batch — backpressure without a broker. This is a
  * replay adapter for durable logs, not a broker: no subscription
  * fan-out, no compaction.
  */
object ReplaySource {

  /** The record schema of Spark's own Kafka source (column-for-column:
    * a consumer written for format("kafka") selects these names). */
  val KafkaShape: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Snapshot a batch DataFrame into a replay log at `dir`.
    *
    * `keyCol` is hashed to one of `nPartitions` (non-negative floorMod,
    * Kafka's default partitioner shape); `offset` is a dense per-
    * partition row number ordered by (`tsCol`, `keyCol`) — deterministic,
    * so two snapshots of the same input are byte-identical logs. The
    * write is `partitionBy("partition")`: one directory per partition,
    * the layout a real log store (or a Kafka connect sink) produces.
    *
    * The per-partition ROW_NUMBER is one shuffle over the partition key
    * — exactly the shuffle a real broker performs on produce; at 100 TB
    * a production writer would append with a monotone sequence instead
    * (offsets only need ORDER, not density, to resume).
    */
  def snapshot(df: DataFrame, dir: String, topic: String, nPartitions: Int,
      keyCol: String, tsCol: String, valueCols: Seq[String]): Unit = {
    import org.apache.spark.sql.expressions.Window
    val keyed = df.select(
      col(keyCol).cast("string").cast("binary").as("key"),
      to_json(struct(valueCols.map(col): _*)).cast("binary").as("value"),
      lit(topic).as("topic"),
      pmod(xxhash64(col(keyCol).cast("string")), lit(nPartitions.toLong))
        .cast("int").as("partition"),
      col(tsCol).cast("timestamp").as("timestamp"),
      lit(0).as("timestampType"), // 0 = CreateTime, Kafka's default
      col(keyCol).cast("string").as("__k"), col(tsCol).as("__t"))
    val w = Window.partitionBy("partition").orderBy(col("__t"), col("__k"))
    keyed
      .withColumn("offset", row_number().over(w).cast("long") - 1L)
      .select(KafkaShape.fieldNames.map(col): _*)
      .write.mode("overwrite").partitionBy("partition").parquet(dir)
  }

  /** Open a replay log as a STREAM with the Kafka record schema.
    * `maxFilesPerTrigger` bounds micro-batch size (broker-less
    * backpressure); the file source's checkpoint makes restarts resume
    * after the last committed batch, exactly-once. */
  def replayStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 4): DataFrame = {
    // the partition directory column comes back from the layout; list
    // the full Kafka column order explicitly so consumers can bind
    // positionally too
    spark.readStream
      .schema(StructType(KafkaShape.filter(_.name != "partition")))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("basePath", dir)
      .parquet(s"$dir/partition=*")
      .select(KafkaShape.fieldNames.map(col): _*)
  }

  /** The same log as a BATCH frame (a consumer backfilling history). */
  def replayBatch(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("basePath", dir).parquet(s"$dir/partition=*")
      .select(KafkaShape.fieldNames.map(col): _*)
  }
