package graft

import graft.engine.Session
import graft.streaming.EventStream

/** CLI surface for the Structured Streaming pipelines: runs one pipeline
  * over a testdata directory's events.parquet (file-source stream, memory
  * sink, drained to completion) and prints the first rows.
  *
  * Usage: runMain graft.StreamCli <tumbling|sliding|session|dedup|join> <sfDir>
  */
object StreamCli {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: graft.StreamCli <tumbling|sliding|session|dedup> <sfDir>")
    val spark = Session.local("graft-stream-cli")
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
}
