package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: empirical scaling evidence for the VECTOR/ANN family —
  * the last `queries()` family without a ladder (dedup/corpus, the
  * relational shapes and the event windows each have one).
  *
  * Synthesizes K× copies of the sf0.1 `embeddings` table: replica r
  * shifts `vec_id` by r·(max vec_id+1) and adds a deterministic
  * per-(vec_id, dim, replica) jitter of ±0.005 to every component
  * (xxhash64-derived — no RNG, reruns are bit-identical). The jitter
  * keeps replicas from being exact copies (which would make every
  * cosine a tie and the top-k ordering a vec_id sort) while leaving
  * the geometry intact, so:
  *  - the three query-vector searches (brute-force top-k, LSH
  *    multi-probe, md5-cell IVF) keep their 1-row broadcast query side
  *    and scan a K×-growing corpus — expected LINEAR. Since round 15
  *    the LSH/IVF widths are CORPUS-DERIVED (lshBitsFor: ~256 vectors
  *    per cell at any scale), so per-bucket population — and with it
  *    the probed candidate set — stays roughly CONSTANT across the
  *    ladder; the per-K cell census printed after the timing table is
  *    the direct evidence (vs n/16 under the old fixed bits=4);
  *  - quantize/centroid explode to (rows × 64 dims) and re-join
  *    against O(dims) / O(labels×dims) stats frames — LINEAR, and the
  *    stats frames stay broadcast-sized BY CONSTRUCTION (64 / 640
  *    rows) no matter how far the corpus scales;
  *  - labels are copied verbatim, so `q_dedup_embedding`'s label
  *    blocks grow K× — which since round 18 is exactly the skew its
  *    per-label sign-prefix banding exists to bound: block size n_l
  *    derives 2^b buckets of ~256 (embedBucketBitsFor), so within-block
  *    pair work grows ~n_l·256, not n_l². The pre-banding query was
  *    capped at K=16 here (~51 M scored pairs); the banded query runs
  *    the full ladder and is expected LINEAR-ish (the replica jitter
  *    spreads sign bits, so buckets populate evenly).
  *
  * The per-K cache hygiene matters here more than in the other probes:
  * the LSH/IVF assignment memo (VectorOps.ivfCache, LRU-8) pins one
  * bucketed-corpus frame per (plan, params) — ProbeHarness.clearCache()
  * between Ks drops the previous scale's frames so each K pays (and is
  * timed on) its own materialization.
  *
  * Usage: runMain graft.tools.ScaleProbeVec [sfDir] [outBase]
  * (GRAFT_PROBE_KS overrides the ladder.)
  */
object ScaleProbeVec {

  private val Queries = Seq("q_sim_cosine_topk", "q_sim_ann_lsh",
    "q_sim_ivf", "q_embed_quantize", "q_sim_centroid_dist",
    // round-14 PQ: the codebook is 16 md5-sampled vectors (TakeOrdered,
    // constant size at any K), encode+ADC is one map-side projection
    // over the corpus, the shortlist is TakeOrdered-50 — expected LINEAR
    "q_sim_pq",
    // round-14 batch k-NN join: 8-row broadcast query side, cell-keyed
    // join (per-cell population grows K×), WindowGroupLimit top-5 —
    // expected LINEAR
    "q_sim_knn_join",
    "q_dedup_embedding")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outBase = args.lift(1).getOrElse("/tmp/graft_scale_vec")
    val spark = ProbeHarness.session()

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // max+1 offset keeps replica id ranges disjoint even for sparse ids;
    // MIN(vec_id) — every search query's probe vector — stays in replica 0
    val offset = base.agg(max(col("vec_id"))).head().getLong(0) + 1

    def replica(r: Int): DataFrame = base.select(
      (col("vec_id") + lit(r * offset)).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        (x.cast("double") +
          (pmod(xxhash64(col("vec_id"), i, lit(r)), lit(1000)).cast("double")
            / lit(100000.0) - lit(0.005))).cast("float")).as("embedding"),
      col("label"))

    // q_dedup_embedding uncapped since round 18: its per-label banding
    // bounds the verbatim-label blocks this ladder grows (see header)
    ProbeHarness.run(spark, Queries,
      ProbeHarness.ks(Seq(1, 4, 16, 64)), outBase, (k, dir) =>
        (0 until k).map(replica).reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet"))

    // Round-15 cell census: per-cell candidate volume under the DERIVED
    // LSH width across the ladder — the verdict's fixed-parameter
    // reservation was per-cell population growing as n/16; derived bits
    // must hold avg_pop ≈ 256 while fixed4_pop (= n/16) grows 64×.
    // (ProbeHarness.run stops its session; the census opens a fresh one.)
    val spark2 = ProbeHarness.session()
    ProbeHarness.ks(Seq(1, 4, 16, 64)).foreach { k =>
      val dir = s"$outBase/k$k"
      val e = spark2.read.parquet(s"$dir/embeddings.parquet")
      val dn = e.agg(max(size(col("embedding"))), count(lit(1))).head()
      val (dim, n) = (dn.getInt(0), dn.getLong(1))
      val bits = graft.ops.VectorOps.lshBitsFor(n)
      val pop = e.select(graft.ops.VectorOps.lshSignature(
          transform(col("embedding"), x => x.cast("double")), dim, bits).as("cell"))
        .groupBy("cell").count()
        .agg(avg("count"), max("count"), count(lit(1))).head()
      System.err.println(f"[probe] cells @K=$k: n=$n bits=$bits " +
        f"cells_used=${pop.getLong(2)} avg_pop=${pop.getDouble(0)}%.1f " +
        f"max_pop=${pop.getLong(1)} fixed4_pop=${n / 16}")
    }

    // Round-17 distributed-PQ-fit rung (VERDICT r16 #6): the
    // full-corpus Lloyd (fitDistributed=true) is spec-pinned at 1×
    // only; run BOTH fit paths at the ladder's TOP rung and report
    // wall + recall@10 against the brute-force cosine top-10, so the
    // 100 TB fit path is measured at scale, not just typed. Each
    // iteration is one corpus scan (map-side assign vs the codebook
    // literal) + one ≤ m·k-group aggregation — the census above shows
    // the corpus size this pays for.
    val topK = ProbeHarness.ks(Seq(1, 4, 16, 64)).max
    val dirTop = s"$outBase/k$topK"
    val eTop = spark2.read.parquet(s"$dirTop/embeddings.parquet")
    val qid = eTop.agg(min(col("vec_id"))).head().getLong(0)
    val qv = eTop.filter(col("vec_id") === qid)
      .select(transform(col("embedding"), x => x.cast("double")))
      .head().getSeq[Double](0)
    val brute = eTop.filter(col("vec_id") =!= qid)
      .select(col("vec_id"), graft.functions.CosineSim.cosine_sim(
        transform(col("embedding"), x => x.cast("double")),
        typedLit(qv)).as("cs"))
      .orderBy(col("cs").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    Seq(false, true).foreach { dist =>
      val label = if (dist) "distributed" else "sampled"
      val t0 = System.nanoTime()
      val got = graft.ops.VectorOps.pqProbe(eTop, fitDistributed = dist)
        .collect().map(_.getLong(0)).toSet
      val wall = (System.nanoTime() - t0) / 1e9
      val recall = got.count(brute.contains).toDouble / brute.size
      System.err.println(f"[probe] pq-fit($label) @K=$topK: " +
        f"wall=$wall%.2f s recall@10=$recall%.2f")
    }
  }
}
