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
    val spark = ProbeHarness.session()

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    // max+1, not count-based: replica id ranges stay disjoint even for
    // sparse doc_ids (a count-derived offset collides when ids exceed
    // 10× the row count)
    val offset = base.agg(max(col("doc_id"))).head().getLong(0) + 1

    def replica(r: Int): DataFrame = base.select(
      (col("doc_id") + lit(r * offset)).as("doc_id"),
      // suffix every token: replicas share no shingles/tokens, so dup
      // pairs / contamination hits stay strictly within one replica
      regexp_replace(col("text"), "(\\S+)", s"$$1~$r").as("text"),
      col("lang"), col("source"),
      col("n_chars"))

    ProbeHarness.run(spark, ProbeHarness.qs(Queries),
      ProbeHarness.ks(Seq(1, 2, 4, 8, 32, 64)), outBase, (k, dir) =>
        (0 until k).map(replica).reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet"))
  }
}
