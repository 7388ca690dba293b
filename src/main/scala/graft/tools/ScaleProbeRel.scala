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
  * r·(max custkey+1), so joins resolve strictly within one replica and
  * true work grows linearly in K (64× ≈ 38 M lineitem rows). Dimension
  * tables (nation, region, supplier) are copied verbatim — so groups
  * keyed on offset ids (per-order, per-customer) stay constant-sized
  * across K, while groups keyed on dimension values (per-nation,
  * per-returnflag) grow linearly with K; join *resolution* stays within
  * one replica either way, which is what the linearity conclusion rests
  * on. Times the money-aggregate, grouping-set, exact-quantile,
  * window-top-N and star/fact join shapes at K = 1, 4, 16, 64: a shape
  * that is quadratic — or a broadcast that only fits at toy scale —
  * bends the curve long before 64×.
  *
  * Usage: runMain graft.tools.ScaleProbeRel [sfDir] [outBase]
  */
object ScaleProbeRel {

  private val Queries = Seq("q_agg_group", "q_grouping_sets", "q_agg_stats",
    "q_topn_per_group", "q_tpch_q3_shape", "q_tpch_q18_shape",
    "q_join_multiway", "q_cte_maxrev",
    // round 13: the two-nation star (dims verbatim per replica — the
    // pair slice grows linearly) and the KLL rollup (sketch count is
    // O(#groups); per-sketch work O(rows))
    "q_tpch_q7_shape", "q_agg_kll_merge",
    // frequency-sketch rollup: sketch count O(#groups), map capacity
    // fixed — per-row update cost tracks the scan
    "q_agg_freq_merge",
    // round 13b: the decorrelation composites. Q21's semi/anti
    // self-joins hash on l_orderkey (disjoint per replica → per-order
    // work constant); Q2's (part,supplier) MIN has a fixed group domain
    // so only the scan+partial-agg grows; Q22 anti-joins on the
    // replicated customer key
    "q_tpch_q2_shape", "q_tpch_q21_shape", "q_tpch_q22_shape",
    // round 13c: the heavy new TPC-H completions. Q8/Q9 walk the full
    // star (part/supplier verbatim per replica → per-part/supplier
    // groups grow ×K but stay partial-agg-combinable); Q13's two-level
    // aggregate hashes on the replicated custkey then the bounded count
    // domain; Q16's anti join + COUNT DISTINCT hash on verbatim
    // supplier/part keys; Q17's per-part average join is the
    // agg-dominance shape; Q19 is scan-dominated with the disjunction
    // as a post-join residual
    "q_tpch_q8_shape", "q_tpch_q9_shape", "q_tpch_q13_shape",
    "q_tpch_q16_shape", "q_tpch_q17_shape", "q_tpch_q19_shape")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outBase = args.lift(1).getOrElse("/tmp/graft_scale_rel")
    val spark = ProbeHarness.session()

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
    // max+1 offsets keep replica key ranges disjoint even for sparse ids
    val oOff = ord.agg(max(col("o_orderkey"))).head().getLong(0) + 1
    val cOff = cust.agg(max(col("c_custkey"))).head().getLong(0) + 1

    def liRep(r: Int): DataFrame =
      li.withColumn("l_orderkey", col("l_orderkey") + lit(r * oOff))
    def ordRep(r: Int): DataFrame = ord
      .withColumn("o_orderkey", col("o_orderkey") + lit(r * oOff))
      .withColumn("o_custkey", col("o_custkey") + lit(r * cOff))
    def custRep(r: Int): DataFrame =
      cust.withColumn("c_custkey", col("c_custkey") + lit(r * cOff))

    ProbeHarness.run(spark, ProbeHarness.qs(Queries).filter(Queries.contains),
      ProbeHarness.ks(Seq(1, 4, 16, 64)), outBase, (k, dir) => {
        (0 until k).map(liRep).reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
        (0 until k).map(ordRep).reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/orders.parquet")
        (0 until k).map(custRep).reduce(_ unionAll _)
          .write.mode("overwrite").parquet(s"$dir/customer.parquet")
        Seq("nation", "region", "supplier", "part").foreach { t =>
          spark.read.parquet(s"$sfDir/$t.parquet")
            .write.mode("overwrite").parquet(s"$dir/$t.parquet")
        }
      })
  }
}
