package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Quantiles, Tables}

/** Round-21 interleaved A/B probe: OLD vs NEW formulations of the
  * quantile-family operators, alternated in ONE session so box drift
  * hits both sides equally (this box's controls drift 1.5-2× between
  * separate sbt invocations — see OPTIMIZATION_r21.md "Measurement
  * caveat"). Usage: runMain graft.tools.ProbeR21 [sfDir] [reps]
  *
  * The OLD formulations are frozen copies of the round-20 code; the
  * NEW side calls the live operators via SparkEntry, so this probe
  * keeps measuring the committed code as it evolves.
  */
object ProbeR21 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
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
    def li = Tables.lineitem(spark, sfDir)

    // ---- OLD q_agg_stats: three raw scans (two per-measure histograms
    // + sv), the round-20 shape.
    def oldStats(): DataFrame = {
      val medQty = Quantiles.histQuantilesOf(
          li, "l_returnflag", "l_quantity", Seq("med_qty" -> 0.5))
        .withColumnRenamed("g", "f")
      val p90Price = Quantiles.histQuantilesOf(
          li, "l_returnflag", "l_extendedprice", Seq("p90_price_raw" -> 0.9))
        .withColumnRenamed("g", "f")
      val quantiles = medQty.join(p90Price, "f")
      val sv = li.groupBy(col("l_returnflag").as("f")).agg(
        round(stddev_samp(col("l_discount")), 6).as("sd_disc"),
        round(var_samp(col("l_discount")), 6).as("var_disc"))
      sv.join(quantiles, "f")
        .select(col("f").as("l_returnflag"), col("sd_disc"), col("var_disc"),
          col("med_qty"), round(col("p90_price_raw"), 4).as("p90_price"))
        .orderBy("l_returnflag")
    }

    // ---- OLD q_agg_approx_quantile: histogram exact side + a SECOND
    // raw scan feeding percentile_approx (GK), the round-20 shape.
    def oldApproxQuantile(): DataFrame = {
      val exact = Quantiles.histQuantilesOf(
        li, "l_returnflag", "l_extendedprice",
        Seq("p50" -> 0.5, "p99" -> 0.99))
        .withColumnRenamed("g", "f")
      val sketch = li
        .groupBy(col("l_returnflag").as("f"))
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.99)), lit(1000)).as("aq"))
        .select(col("f"), col("aq")(0).as("a50"), col("aq")(1).as("a99"))
      exact.join(sketch, "f")
        .select(col("f").as("l_returnflag"), col("p50"), col("p99"),
          (abs(col("a50") - col("p50")) / col("p50") <= 0.05 &&
           abs(col("a99") - col("p99")) / col("p99") <= 0.05).as("sketch_ok"))
        .orderBy("l_returnflag")
    }

    // ---- OLD q_agg_kll_merge: cached histogram exact sides + a SECOND
    // raw scan feeding per-group Datasketches KLL, the round-20 shape
    // (cache elided: one suite run pays the cold path anyway, and the
    // uncached subtree is exchange-reused — like-for-like with NEW).
    def oldKllMerge(): DataFrame = {
      import graft.functions.SketchExprs
      val hist = li
        .groupBy(col("l_returnflag").as("g"),
          col("l_extendedprice").cast("double").as("v"))
        .agg(count(lit(1)).as("c"))
      val exact = Quantiles.histQuantiles(hist, Seq("p50" -> 0.5))
        .withColumnRenamed("g", "f")
      val globalExact = Quantiles.histQuantiles(
        hist.groupBy("v").agg(sum(col("c")).as("c"))
          .select(lit("ALL").as("g"), col("v"), col("c")),
        Seq("gp50" -> 0.5))
        .select("gp50")
      val merged = li
        .groupBy("l_returnflag")
        .agg(SketchExprs.kllSketchAgg(col("l_extendedprice")).as("sk"))
        .agg(SketchExprs.kllQuantile(SketchExprs.kllMergeAgg(col("sk")), 0.5).as("est"))
      val ok = merged.crossJoin(broadcast(globalExact))
        .select((abs(col("est") - col("gp50")) / col("gp50") <= 0.05).as("merged_ok"))
      exact.select(col("f").as("l_returnflag"), col("p50"))
        .crossJoin(broadcast(ok))
        .orderBy("l_returnflag")
    }

    def newQ(name: String)(): DataFrame = graft.SparkEntry.queries(name)(spark, sfDir)

    val pairs: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("q_agg_stats", () => oldStats(), newQ("q_agg_stats") _),
      ("q_agg_approx_quantile", () => oldApproxQuantile(), newQ("q_agg_approx_quantile") _),
      ("q_agg_kll_merge", () => oldKllMerge(), newQ("q_agg_kll_merge") _))

    def time(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    pairs.foreach { case (name, oldF, newF) =>
      // warm both once (codegen/JIT), then alternate old/new
      time(oldF()); time(newF()); graft.ops.Caches.release()
      val olds = scala.collection.mutable.ArrayBuffer.empty[Double]
      val news = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ =>
        olds += time(oldF()); graft.ops.Caches.release()
        news += time(newF()); graft.ops.Caches.release()
      }
      def fmt(xs: Seq[Double]) =
        f"min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f " +
          xs.map(x => f"$x%.2f").mkString("[", ",", "]")
      println(f"$name%-24s OLD ${fmt(olds.toSeq)}")
      println(f"$name%-24s NEW ${fmt(news.toSeq)}")
    }
    spark.stop()
  }
}
