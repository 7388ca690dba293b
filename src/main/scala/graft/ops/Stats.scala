package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Distribution-shape aggregates (Tier-B statistics surface widening,
  * round 12): Shannon entropy, deterministic mode, fixed-width
  * histogram, and skewness/kurtosis. These are the remaining
  * "describe a column's distribution" aggregates a DuckDB user has
  * (`entropy()`, `mode()`, `histogram()`, `skewness()`, `kurtosis()`,
  * cf. the reference's delegated SELECT surface, /root/reference/
  * doc.py:186-188) that the library had not yet named as operators.
  *
  * Scale design notes (common to all four):
  *  - Everything is built on the *value histogram* shape — a map-side-
  *    combinable `GROUP BY (group, value)` whose shuffle carries
  *    distinct values, not rows. Entropy/mode/moments then reduce the
  *    tiny histogram. At 100 TB the first aggregate is the only pass
  *    over data; no operator buffers raw values per group.
  *  - Mode's tie-break is pinned (higher count, then smaller value) so
  *    the result is deterministic and engine-independent — DuckDB's
  *    own `mode()` leaves ties unspecified, which is exactly why the
  *    operator is built from the histogram instead.
  *  - The histogram op uses explicit `floor((v - lo) / w)` bucket
  *    arithmetic (identical text in both engines) rather than a
  *    built-in `width_bucket`, which DuckDB lacks.
  *  - Skew/kurtosis use Spark's codegen'd one-pass moment aggregates;
  *    the oracle computes the same population moments two-pass. Both
  *    round to 6 dp — the documented float-agg convention (same as
  *    corr/covar in [[Scalars]]).
  */
object Stats {

  /** Shannon-entropy reduction over a value histogram `h` with columns
    * (`g`, "c"): returns one row per `g` with `entropy` (bits, rounded
    * to the 6-dp float-agg convention), `v` (distinct values) and `n`
    * (total count). The ONE shared implementation behind q_agg_entropy
    * and q_text_entropy — the convention lives here, not in copies. */
  private[graft] def histogramEntropy(h: DataFrame, g: String): DataFrame = {
    val n = h.groupBy(g).agg(sum("c").as("n"), count(lit(1)).as("v"))
    val p = col("c").cast("double") / col("n")
    h.join(n, g)
      .groupBy(g)
      // `+ 0.0` before the round: a single-valued group gives
      // -SUM(0.0) = -0.0, which DuckDB's ROUND preserves but Spark's
      // normalizes to +0.0 (BigDecimal path) — a latent hash mismatch.
      // Adding +0.0 maps -0.0 → +0.0 and is an exact identity for every
      // other double, so both engines' arithmetic stays bit-identical.
      .agg(round(-sum(p * log2(p)) + lit(0.0), 6).as("entropy"),
           max(col("v")).as("v"), max(col("n")).as("n"))
  }

  val queries: Seq[OpQuery] = Seq(

    // Shannon entropy (bits) of the per-group value distribution, plus
    // the distinct-value count. Histogram → p·log2 p reduction.
    OpQuery("q_agg_entropy",
      """WITH h AS (
        |  SELECT l_returnflag AS f, l_quantity AS v, COUNT(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |n AS (SELECT f, SUM(c) AS n FROM h GROUP BY f)
        |SELECT h.f AS l_returnflag,
        |       ROUND(-SUM((CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / n)) + 0.0, 6) AS qty_entropy,
        |       CAST(COUNT(*) AS BIGINT) AS n_distinct
        |FROM h JOIN n ON h.f = n.f
        |GROUP BY h.f ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val h = lineitem(s, d)
        .groupBy(col("l_returnflag").as("f"), col("l_quantity").as("value"))
        .agg(count(lit(1)).as("c"))
      histogramEntropy(h.drop("value"), "f")
        .select(col("f").as("l_returnflag"), col("entropy").as("qty_entropy"),
                col("v").as("n_distinct"))
        .orderBy("l_returnflag")
    },

    // Deterministic mode per group: most frequent value, ties broken
    // toward the smaller value. The per-group window runs over the
    // distinct-value histogram (≤50 rows/group here), never raw rows.
    OpQuery("q_agg_mode",
      """WITH h AS (
        |  SELECT l_returnflag AS f, l_quantity AS v, COUNT(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT f, v, c,
        |         ROW_NUMBER() OVER (PARTITION BY f ORDER BY c DESC, v ASC) AS rn
        |  FROM h)
        |SELECT f AS l_returnflag, v AS mode_qty, CAST(c AS BIGINT) AS mode_count
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val h = lineitem(s, d)
        .groupBy(col("l_returnflag").as("f"), col("l_quantity").as("v"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("f").orderBy(col("c").desc, col("v").asc)
      h.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("f").as("l_returnflag"), col("v").as("mode_qty"),
                col("c").as("mode_count"))
        .orderBy("l_returnflag")
    },

    // Fixed-width histogram of l_extendedprice: 10 buckets over
    // [900, 105000), under/overflow pinned to buckets 0 and 11 (the
    // SQL-standard width_bucket contract, spelled out because DuckDB
    // has no width_bucket). Bucket arithmetic is textually identical
    // in both engines; per-bucket money sums use the exact decimal
    // summation convention.
    OpQuery("q_agg_histogram",
      s"""WITH b AS (
         |  SELECT CASE WHEN l_extendedprice < 900.0 THEN 0
         |              WHEN l_extendedprice >= 105000.0 THEN 11
         |              ELSE CAST(floor((l_extendedprice - 900.0) / 10410.0) AS BIGINT) + 1
         |         END AS bucket,
         |         l_extendedprice
         |  FROM lineitem)
         |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
         |       ROUND(MIN(l_extendedprice), 2) AS lo_price,
         |       ROUND(MAX(l_extendedprice), 2) AS hi_price,
         |       ${oSum("l_extendedprice")} AS sum_price
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      val v = col("l_extendedprice")
      val bucket = when(v < 900.0, 0L)
        .when(v >= 105000.0, 11L)
        .otherwise(floor((v - 900.0) / 10410.0).cast("long") + 1L)
      lineitem(s, d)
        .select(bucket.as("bucket"), v)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
             round(min(v), 2).as("lo_price"),
             round(max(v), 2).as("hi_price"),
             dsum(v).as("sum_price"))
        .orderBy("bucket")
    },

    // Skewness / excess kurtosis per group — Spark's one-pass moment
    // aggregates (population definitions: m3/m2^1.5, m4/m2^2 - 3)
    // against a two-pass central-moment oracle. 6-dp rounding absorbs
    // the one-pass-vs-two-pass ulp differences.
    OpQuery("q_agg_skewkurt",
      """WITH s AS (
        |  SELECT l_returnflag AS f, AVG(l_quantity) AS mu,
        |         CAST(COUNT(*) AS DOUBLE) AS n
        |  FROM lineitem GROUP BY 1),
        |m AS (
        |  SELECT s.f AS f,
        |         SUM(POWER(l_quantity - mu, 2)) / MAX(n) AS m2,
        |         SUM(POWER(l_quantity - mu, 3)) / MAX(n) AS m3,
        |         SUM(POWER(l_quantity - mu, 4)) / MAX(n) AS m4
        |  FROM lineitem l JOIN s ON l.l_returnflag = s.f GROUP BY s.f)
        |SELECT f AS l_returnflag,
        |       ROUND(m3 / POWER(m2, 1.5), 6) AS skew_qty,
        |       ROUND(m4 / (m2 * m2) - 3.0, 6) AS kurt_qty
        |FROM m ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag").as("f"))
        .agg(round(skewness(col("l_quantity")), 6).as("skew_qty"),
             round(kurtosis(col("l_quantity")), 6).as("kurt_qty"))
        .select(col("f").as("l_returnflag"), col("skew_qty"), col("kurt_qty"))
        .orderBy("l_returnflag")
    }
  )
}
