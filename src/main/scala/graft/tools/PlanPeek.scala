package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan of one named operator
  * query under the bench/Timeit session config (AQE off, 16 shuffle
  * partitions) — the fastest way to see which join strategy or
  * exchange a change actually produced.
  *
  * Usage: runMain graft.tools.PlanPeek <sfDir> <query> [autoBcastBytes]
  * (pass -1 as the third arg to see the mandatory-broadcast shape the
  * PlanAudit sweep checks)
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = { graft.engine.Session.pinLocale(); SparkSession.builder() }
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.lift(2).foreach(t =>
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", t.toLong))
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    println(df.queryExecution.executedPlan.toString)
  }
}
