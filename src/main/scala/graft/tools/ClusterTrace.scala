package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: splits q_dedup_cluster's wall between the Jaccard
  * dup-pair computation and the label-propagation loop, under the
  * session config named by SPARK_GRAFT_AQE/SPARK_GRAFT_SHUFFLE —
  * the knob pair the production-config bench flips. Run with
  * GRAFT_CLUSTER_TRACE=1 for per-round loop times.
  *
  * Usage: runMain graft.tools.ClusterTrace <sfDir>
  */
object ClusterTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "16")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "false")
    val spark = { graft.engine.Session.pinLocale(); SparkSession.builder() }
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.execution.rangeExchange.sampleSizePerPartition", "20")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cluster-probe] $what%-16s ${(System.nanoTime() - t0) / 1e9}%.3f s (aqe=$aqe shuffle=$shuffle)")
      r
    }
    val docs = graft.ops.Tables.documents(spark, sfDir).select(col("doc_id"))
    val sh = graft.ops.Dedup.shingleTable(spark, sfDir)
    val dupPairs = graft.ops.Dedup
      .thresholdedPairs(sh, graft.ops.Dedup.capFor(spark, sfDir))
      .select("id_a", "id_b")
    val mat = timed("dup-pairs")(dupPairs.cache())
    timed("dup-pairs-count")(println(s"  pairs=${mat.count()}"))
    val labels = timed("loop")(graft.ops.Dedup.clusterLabels(docs, mat))
    timed("final-write")(labels.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
