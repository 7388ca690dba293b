package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: row counts of one operator query across data directories —
  * used by the dup-heavy scaling probe's analysis to show the REPORTED
  * dup pairs grow ~K while the candidate-side work grows ~K²
  * (BENCH_NOTES round 8).
  *
  * Usage: runMain graft.tools.QueryCount <query> <dir> [<dir> ...]
  */
object QueryCount {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val dirs = args.tail.toSeq
    val spark = ProbeHarness.session()
    dirs.foreach { dir =>
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(s"[count] $name @ $dir = $n")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
