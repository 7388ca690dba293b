package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: empirical scaling evidence for the north-star dedup /
  * corpus-hygiene family.
  *
  * Synthesizes K× copies of the sf0.1 documents corpus (replica r
  * offsets doc_id and suffixes EVERY token with `~r`, so replicas share
  * zero shingles — per-replica dup structure is preserved exactly and
  * the true work grows linearly in K), writes each to /tmp, and times
  * the family at K = 1, 2, 4, 8, 32, 64 (64× ≈ 320k docs). If a shape
  * were quadratic in corpus size (all-pairs join, unpruned inverted
  * index), its time would grow ~K² and this probe would show it long
  * before 64×.
  *
  * Usage: runMain graft.tools.ScaleProbe [sfDir] [outBase]
  */
object ScaleProbe {

  private val Queries = Seq("q_dedup_ngram_jaccard", "q_dedup_minhash",
    "q_dedup_simhash", "q_dedup_cluster", "q_corpus_contamination",
    "q_text_repetition", "q_dedup_incremental")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outBase = args.lift(1).getOrElse("/tmp/graft_scale")
    val spark = { graft.engine.Session.pinLocale(); SparkSession.builder() }
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    // max+1, not count-based: replica id ranges stay disjoint even for
    // sparse doc_ids (a count-derived offset collides when ids exceed
    // 10× the row count)
    val offset = base.agg(max(col("doc_id"))).head.getLong(0) + 1

    def replica(r: Int): DataFrame = base.select(
      (col("doc_id") + lit(r * offset)).as("doc_id"),
      // suffix every token: replicas share no shingles/tokens, so dup
      // pairs / contamination hits stay strictly within one replica
      regexp_replace(col("text"), "(\\S+)", s"$$1~$r").as("text"),
      col("lang"), col("source"),
      col("n_chars"))

    def timeOnce(name: String, dir: String): Double = {
      System.err.println(s"[probe] $name @ $dir")
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val ks = Seq(1, 2, 4, 8, 32, 64)
    ks.foreach { k =>
      val dir = s"$outBase/k$k"
      (0 until k).map(replica).reduce(_ unionAll _)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }
    // untimed warmup at K=1: codegen + JIT compilation of the whole
    // family, so the K=1 column measures work, not first-run compilation
    Queries.foreach(q => timeOnce(q, s"$outBase/k1"))
    val results = ks.map { k =>
      // fresh timings per K: drop every cached frame from the previous
      // scale so each K pays its own materialization
      spark.sharedState.cacheManager.clearCache()
      k -> Queries.map(q => q -> timeOnce(q, s"$outBase/k$k")).toMap
    }
    println(f"${"query"}%-26s" + ks.map(k => f"K=$k%-7d").mkString)
    Queries.foreach { q =>
      println(f"$q%-26s" + results.map { case (_, m) => f"${m(q)}%-7.2f" }.mkString)
    }
    val totals = results.map { case (k, m) => k -> m.values.sum }
    println(f"${"TOTAL"}%-26s" + totals.map { case (_, t) => f"$t%-7.2f" }.mkString)
    val (t1, tLast) = (totals.head._2, totals.last._2)
    val kLast = ks.last
    println(f"${kLast}x corpus => ${tLast / t1}%.2fx time (linear=$kLast, " +
      s"quadratic=${kLast * kLast}; sub-linear reflects the fixed per-query floor)")
    spark.stop()
  }
}
