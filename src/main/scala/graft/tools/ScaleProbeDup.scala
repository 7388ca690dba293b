package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: DUP-HEAVY scaling evidence for the dedup family.
  *
  * [[ScaleProbe]] suffixes every token, so replicas share zero shingles
  * — per-replica dup structure is preserved and true work grows
  * linearly, but the MinHash candidate-doc/pair sets and the Jaccard
  * co-occurrence stream stay CONSTANT as K grows. That probe is
  * structurally blind to the failure mode of the round-7 verdict: a
  * frame that is "small at the probe's dup rate" but O(corpus) on a
  * dup-heavy corpus (training crawls routinely run 30–50% near-dups).
  *
  * This variant keeps the first ~60% of each document's tokens
  * UNSUFFIXED across replicas, so the K replicas of a document share
  * ~60% of their shingles:
  *  - cross-replica Jaccard ≈ 0.6/1.4 ≈ 0.43 < the 0.5 threshold, so
  *    the REPORTED dup pairs stay per-replica (output doesn't explode),
  *    while everything upstream of the threshold grows superlinearly —
  *    shared-shingle posting lists grow K×, the pairwise expansion and
  *    `inter` grow ~K², and LSH bands whose minima land in the shared
  *    prefix produce ~K² candidate pairs;
  *  - the corpus-scaled df-cap (max(50, 1% of docs)) keeps RELATIVE
  *    pruning invariant under replication: a shared shingle's df is
  *    K × its base df and the cap is K × the base cap, so a shingle
  *    survives at K iff it survives at K=1 — the measured growth is the
  *    candidate structure, not a pruning artifact.
  *
  * Under the pre-round-8 mandatory broadcasts (stop-set, candidate
  * docs, candidate pairs) this ladder would have pinned ~K²-growing
  * frames in every task's memory; with the merge-hinted semi joins they
  * shuffle and spill instead. Expect superlinear TIME growth here —
  * the work itself is superlinear — so the probe's pass criterion is
  * completion without OOM with time tracking the ~K² candidate work,
  * NOT the linear bound the zero-overlap probe is held to.
  *
  * Usage: runMain graft.tools.ScaleProbeDup [sfDir] [outBase]
  * (GRAFT_PROBE_KS overrides the ladder.)
  */
object ScaleProbeDup {

  private val Queries = Seq("q_dedup_ngram_jaccard", "q_dedup_minhash",
    "q_dedup_cluster", "q_dedup_incremental")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outBase = args.lift(1).getOrElse("/tmp/graft_scale_dup")
    val spark = ProbeHarness.session()

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    // The "a shingle survives at K iff it survives at K=1" cap-invariance
    // claim in the scaladoc needs the SCALED term of the df-cap to
    // dominate its absolute floor already at K=1 (cap = max(DfCap,
    // 1% of docs)): with a base corpus under DfCap*100 docs the floor
    // dominates at K=1 but not at larger K, and part of the measured
    // ladder growth would be a pruning artifact, not candidate
    // structure. sf0.1 (5000 docs) is the smallest valid base.
    require(base.count() >= graft.ops.Dedup.DfCap * 100L,
      s"dup-heavy ladder needs a base corpus of >= ${graft.ops.Dedup.DfCap * 100} docs " +
        s"(df-cap scaling must be out of its floor regime at K=1); use sf0.1 or larger")
    val offset = base.agg(max(col("doc_id"))).head().getLong(0) + 1

    def replica(r: Int): DataFrame = {
      val toks = split(col("text"), " ")
      // first ceil(60%) of tokens shared verbatim across replicas; the
      // tail is suffixed per replica (same token-level edit the linear
      // probe applies to every token)
      val keep = ceil(size(toks) * lit(0.6)).cast("int")
      base.select(
        (col("doc_id") + lit(r * offset)).as("doc_id"),
        concat_ws(" ", transform(toks, (t, i) =>
          when(i < keep, t).otherwise(concat(t, lit(s"~$r"))))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }

    // K=16/32 tail runs only the 100 TB-path queries (MinHash+LSH and
    // incremental admission): the exact-Jaccard pair expansion (which
    // q_dedup_cluster also rides for its edge set) is documented ~K² on
    // a dup-heavy corpus and positioned as the small/medium-corpus tool
    // — timing it at K=32 would measure a documented non-goal, not a
    // regression. The ladder's pass criterion at the tail is the
    // merge-hinted spill paths absorbing another 4× of ~K²-growing
    // candidate structure without OOM.
    ProbeHarness.run(spark, Queries,
      ProbeHarness.ks(Seq(1, 2, 4, 8, 16, 32)), outBase, (k, dir) =>
        (0 until k).map(replica).reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet"),
      maxKFor = Map("q_dedup_ngram_jaccard" -> 8, "q_dedup_cluster" -> 8))
  }
}
