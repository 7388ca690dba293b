package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: empirical scaling evidence for the RELATIONAL family —
  * the companion to [[ScaleProbe]] (which covers the dedup/corpus
  * operators over `documents`).
  *
  * Synthesizes K× copies of the sf0.1 TPC-H-ish fact tables with
  * consistent key offsets — replica r shifts `o_orderkey`/`l_orderkey`
  * by r·(max orderkey+1) and `o_custkey`/`c_custkey` by
  * r·(max custkey+1), so joins resolve strictly within one replica,
  * per-group sizes stay constant, and true work grows linearly in K
  * (64× ≈ 38 M lineitem rows). Dimension tables (nation, region,
  * supplier) are copied verbatim. Times the money-aggregate, grouping-
  * set, exact-quantile, window-top-N and star/fact join shapes at
  * K = 1, 4, 16, 64: a shape that is quadratic — or a broadcast that
  * only fits at toy scale — bends the curve long before 64×.
  *
  * Usage: runMain graft.tools.ScaleProbeRel [sfDir] [outBase]
  */
object ScaleProbeRel {

  private val Queries = Seq("q_agg_group", "q_grouping_sets", "q_agg_stats",
    "q_topn_per_group", "q_tpch_q3_shape", "q_tpch_q18_shape",
    "q_join_multiway", "q_cte_maxrev")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outBase = args.lift(1).getOrElse("/tmp/graft_scale_rel")
    val spark = { graft.engine.Session.pinLocale(); SparkSession.builder() }
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    // max+1 offsets keep replica key ranges disjoint even for sparse ids
    val oOff = ord.agg(max(col("o_orderkey"))).head.getLong(0) + 1
    val cOff = cust.agg(max(col("c_custkey"))).head.getLong(0) + 1

    def liRep(r: Int): DataFrame =
      li.withColumn("l_orderkey", col("l_orderkey") + lit(r * oOff))
    def ordRep(r: Int): DataFrame = ord
      .withColumn("o_orderkey", col("o_orderkey") + lit(r * oOff))
      .withColumn("o_custkey", col("o_custkey") + lit(r * cOff))
    def custRep(r: Int): DataFrame =
      cust.withColumn("c_custkey", col("c_custkey") + lit(r * cOff))

    val ks = Seq(1, 4, 16, 64)
    ks.foreach { k =>
      val dir = s"$outBase/k$k"
      (0 until k).map(liRep).reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      (0 until k).map(ordRep).reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      (0 until k).map(custRep).reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      Seq("nation", "region", "supplier").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet")
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
    }

    def timeOnce(name: String, dir: String): Double = {
      System.err.println(s"[probe] $name @ $dir")
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // untimed K=1 warmup absorbs codegen/JIT for the whole family
    Queries.foreach(q => timeOnce(q, s"$outBase/k1"))
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
