package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT quantiles without ever sorting a full group.
  *
  * `quantile_cont` semantics: the value at rank 1+(n-1)*q in ascending
  * order, linearly interpolated between the floor/ceil bracket ranks.
  * Spark's exact `percentile` buffers every raw value per group in the
  * aggregation state (measured 30× slower than DuckDB's streaming
  * quantile at sf0.1 and memory-unbounded at scale); `approx_percentile`
  * changes the answer. This operator gets the exact answer with bounded
  * state via bucket-prune rank location:
  *
  *  1. count rows per (group, measure, floor(v/width)) — a tiny
  *     map-side-combinable aggregate;
  *  2. prefix-sum bucket counts per (group, measure) to locate which
  *     bucket holds the target ranks — a window over the small bucket
  *     table, never the data;
  *  3. rank ONLY the located buckets' rows (~width⁻¹ of each group)
  *     and read the values at the exact global ranks.
  *
  * All measures ride one long-format pass, so the input is scanned
  * twice total (bucket counts + candidate ranking) regardless of how
  * many (column, q) pairs are requested. No step sorts more than one
  * bucket per group — the shape that survives groups of any size.
  */
object Quantiles {

  /** One requested quantile: output name, source column, fraction q in
    * [0,1], and the value-bucket width (pick ~range/1000; correctness
    * does not depend on it, only pruning efficiency). */
  final case class Measure(name: String, valueCol: String, q: Double, width: Double)

  /** → one row per group: `groupCol`, then a double column per measure
    * name. Input rows with NULL group or value are excluded (matching
    * SQL aggregate semantics). */
  def groupQuantiles(df: DataFrame, groupCol: String,
      measures: Seq[Measure]): DataFrame = {
    require(measures.nonEmpty && measures.map(_.name).distinct.size == measures.size,
      "measures must be non-empty with unique names")
    // ONE scan of the input regardless of measure count: each row
    // explodes into (measure tag, value) pairs. The unionAll-of-scans
    // alternative reads the source once per measure — twice the I/O for
    // the common median+p90 pair, and N× at a 100 TB source.
    val pairs = measures.map { m =>
      struct(lit(m.name).as("m"), col(m.valueCol).cast("double").as("v"))
    }
    val vals = df.filter(col(groupCol).isNotNull)
      .select(col(groupCol).as("f"), explode(array(pairs: _*)).as("p"))
      .select(col("f"), col("p.m").as("m"), col("p.v").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("b", floor(col("v") / widthOf(measures)))
    // Caches.cached: ~(groups × measures × buckets) rows; materializing
    // it gives the planner the table's real (tiny) size, so the probe
    // join below broadcasts the bucket side by itself whenever it
    // actually fits — without the stats it mis-estimates and
    // broadcasts the O(input) side (observed), and a broadcast HINT
    // on `located` would be a mandatory broadcast of an O(groups ×
    // measures) table, the 100 TB OOM class removed from Dedup. (An
    // explicit shuffle-hash join measured 1.5× slower at sf0.1: it
    // re-shuffles the full probe side that broadcast leaves in place.)
    // Registered with [[Caches]] so long-lived sessions release it.
    val bCounts = Caches.cached(vals.groupBy("f", "m", "b").agg(count(lit(1)).as("c")))
    val qq = qOf(measures)
    // Prefix offset AND group total ride the same window partitioning —
    // one exchange of the tiny bucket table locates the target ranks,
    // with no separate count aggregate and no join back.
    val byGroup = Window.partitionBy("f", "m")
    val located = bCounts
      .withColumn("off", coalesce(sum(col("c")).over(
        byGroup.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("c")).over(byGroup))
      .withColumn("i", lit(1.0) + (col("n") - 1).cast("double") * qq)
      .withColumn("rlo", floor(col("i"))).withColumn("rhi", ceil(col("i")))
      // keep buckets overlapping the rank span [rlo, rhi]
      .filter(col("off") < col("rhi") && col("off") + col("c") >= col("rlo"))
      .select(col("f"), col("m"), col("b"), col("off"), col("rlo"), col("rhi"), col("n"))
    // Rank ONLY the located buckets' rows (~width⁻¹ of each group)
    // through Spark's spillable exchange+sort+window — NOT a
    // collect_list array per bucket, which would make peak task memory
    // proportional to the largest located bucket (a constant or
    // heavily-tied measure column concentrates a whole group into one
    // bucket, and buffering it as a single in-memory array is the
    // value-buffering failure mode this operator exists to avoid).
    // Global rank = off + rank within the bucket; a rank span can
    // straddle two adjacent buckets, so pick per row here, max per
    // group below.
    val picked = vals.join(located, Seq("f", "m", "b"))
      .withColumn("r", col("off") + row_number().over(
        Window.partitionBy("f", "m", "b").orderBy("v")))
      .select(col("f"), col("m"), col("n"),
        when(col("r") === col("rlo"), col("v")).as("lov"),
        when(col("r") === col("rhi"), col("v")).as("hiv"))
    // ONE aggregate straight to a row per group with a column triple
    // per measure (the separate per-(group, measure) aggregate + pivot
    // this replaces cost an extra exchange each)
    val aggCols = measures.flatMap { mm =>
      val tag = col("m") === mm.name
      Seq(max(when(tag, col("n"))).as(s"__n_${mm.name}"),
        max(when(tag, col("lov"))).as(s"__lo_${mm.name}"),
        max(when(tag, col("hiv"))).as(s"__hi_${mm.name}"))
    }
    val byF = picked.groupBy("f").agg(aggCols.head, aggCols.tail: _*)
    // linear interpolation in a fixed association order:
    // lo + (i - floor(i)) * (hi - lo), i = 1.0 + (n-1)*q
    val outCols = col("f").as(groupCol) +: measures.map { mm =>
      val n = col(s"__n_${mm.name}")
      val lo = col(s"__lo_${mm.name}")
      val hi = col(s"__hi_${mm.name}")
      val i = lit(1.0) + (n - 1).cast("double") * lit(mm.q)
      (lo + (i - floor(i)) * (hi - lo)).as(mm.name)
    }
    byF.select(outCols: _*)
  }

  /** EXACT interpolated quantiles from a pre-aggregated value histogram
    * (columns `g`, `v`, `c`): the cumulative-sum bracket formulation —
    * one window plus one aggregate over the HISTOGRAM, never the raw
    * rows. The right shape when the value domain is small relative to
    * the corpus (integer token counts, ratings): the source is scanned
    * ONCE to build (g, v, c) and never again, where [[groupQuantiles]]
    * pays two passes over raw rows (bucket counts + candidate ranking).
    * Same `1+(n-1)q` rank and `lo + frac·(hi−lo)` interpolation in the
    * same association order, so the doubles are bit-identical to both
    * [[groupQuantiles]] and the oracle's histogram-cumsum SQL.
    * → one row per group: `g`, then a double column per measure
    * `(name, q)`. NULL groups/values are excluded, matching SQL
    * aggregate semantics. */
  def histQuantiles(hist: DataFrame, measures: Seq[(String, Double)]): DataFrame = {
    require(measures.nonEmpty && measures.map(_._1).distinct.size == measures.size,
      "measures must be non-empty with unique names")
    val byG = Window.partitionBy("g")
    // cum rides the same tiny-table window partitioning as groupQuantiles'
    // `located`: one exchange of the histogram locates every rank.
    val cum = hist.filter(col("g").isNotNull && col("v").isNotNull)
      .withColumn("cum", sum(col("c")).over(byG.orderBy("v")))
      .withColumn("n", sum(col("c")).over(byG))
    def rank(q: Double): Column =
      lit(1.0) + (col("n") - 1).cast("double") * lit(q)
    // a rank span [floor(i), ceil(i)] can straddle two adjacent values:
    // lo = first value whose cum reaches floor(i), hi = first reaching
    // ceil(i) — MIN(CASE …) over the cum rows, the oracle's br CTE.
    val aggs = measures.flatMap { case (name, q) =>
      Seq(min(when(col("cum") >= floor(rank(q)), col("v"))).as(s"__lo_$name"),
          min(when(col("cum") >= ceil(rank(q)), col("v"))).as(s"__hi_$name"))
    }
    val br = cum.groupBy("g").agg(max(col("n")).as("n"), aggs: _*)
    val outs = measures.map { case (name, q) =>
      val i = lit(1.0) + (col("n") - 1).cast("double") * lit(q)
      (col(s"__lo_$name") +
        (i - floor(i)) * (col(s"__hi_$name") - col(s"__lo_$name"))).as(name)
    }
    br.select(col("g") +: outs: _*)
  }

  /** [[histQuantiles]] straight off raw rows: builds the per-group value
    * histogram `(g, v, c)` in ONE map-side-combinable hash-aggregate
    * scan (the shuffle carries distinct values, not rows) and reads the
    * quantiles off it. The right entry point when the measure column's
    * value DOMAIN is bounded (decimal prices/quantities, integer token
    * counts): [[groupQuantiles]] pays two passes over raw rows (bucket
    * counts + candidate ranking) for the general unbounded-domain case,
    * which the round-18 sf10 audit measured at 9–12× DuckDB on 60M-row
    * lineitem, while this path's one histogram scan is the same shape
    * as the oracle's h/cum/br CTE chain — doubles match bitwise (the
    * `v.cast(double)` mirrors groupQuantiles' early cast; decimal→double
    * is injective on these ≤2-dp, ≤1e6 domains, so grouping before or
    * after the cast yields the same histogram). */
  def histQuantilesOf(df: DataFrame, groupCol: String, valueCol: String,
      measures: Seq[(String, Double)]): DataFrame =
    histQuantiles(
      df.groupBy(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
        .agg(count(lit(1)).as("c")),
      measures)

  /** per-row width chosen by measure tag. */
  private def widthOf(measures: Seq[Measure]): Column =
    measures.tail.foldLeft(when(col("m") === measures.head.name, measures.head.width)) {
      (acc, m) => acc.when(col("m") === m.name, m.width)
    }.otherwise(lit(Double.NaN))

  /** per-row q chosen by measure tag. */
  private def qOf(measures: Seq[Measure]): Column =
    measures.tail.foldLeft(when(col("m") === measures.head.name, measures.head.q)) {
      (acc, m) => acc.when(col("m") === m.name, m.q)
    }.otherwise(lit(Double.NaN))
}
