package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Round-21 instrument: count the Spark jobs and stages a named query
  * triggers (plus wall seconds). Under the driver's 12-stream
  * concurrent protocol a query's latency floor is its SERIAL stage
  * chain × the per-stage scheduling floor, so the job/stage count is
  * the thing to shrink for the sub-second class (r20 verdict item 5 /
  * guide §1 "measure first"). Usage:
  *   runMain graft.tools.ProbeJobs [sfDir] q1 q2 ...
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = { graft.engine.Session.pinLocale(); SparkSession.builder() }
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.execution.rangeExchange.sampleSizePerPartition", "20")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    // warm table caches like the bench does
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { t =>
      try graft.ops.Tables.t(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    try graft.ops.Tables.events(spark, sfDir).count() catch { case _: Throwable => () }
    names.foreach { n =>
      // run once untimed (JIT, memoized index builds), then measure
      def once(): (Int, Int, Double) = {
        Thread.sleep(300) // let queued listener events drain
        val (j0, s0) = (jobs.get(), stages.get())
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let queued listener events drain
        (jobs.get() - j0, stages.get() - s0, dt)
      }
      once(); graft.ops.Caches.release()
      val (j, s, dt) = once()
      graft.ops.Caches.release()
      println(f"$n%-28s jobs=$j%3d stages=$s%3d wall=$dt%.3f s")
    }
    spark.stop()
  }
}
