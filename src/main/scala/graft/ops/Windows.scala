package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Window-function family (SURVEY.md §2 Tier B "Window functions"):
  * ranking, lag/lead, running/moving frames, ntile, first/last value,
  * top-N per group.
  *
  * Every window ORDER BY includes a unique tie-break key so both engines
  * rank identically. Running double sums are order-identical on both
  * engines (same sequential fold), so they need no rounding; frame
  * averages are rounded defensively.
  */
object Windows {

  val queries: Seq[OpQuery] = Seq(

    OpQuery("q_window_rank",
      """SELECT o_orderkey, o_orderstatus,
        |       CAST(row_number() OVER w AS BIGINT) AS rn,
        |       CAST(rank()       OVER w AS BIGINT) AS rk,
        |       CAST(dense_rank() OVER w AS BIGINT) AS drk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderstatus, rn""".stripMargin) { (s, d) =>
      // Decomposed (round 20, the q_window_percent_rank precedent):
      // PARTITION BY o_orderstatus has ≤3 distinct values at EVERY SF,
      // so the native window funneled the whole orders table into ≤3
      // tasks with full sorts — 26.9 s solo at sf10, the second-slowest
      // suite entry, and a non-plan at 1000 executors. The window order
      // (o_totalprice DESC, o_orderkey) is TOTAL (o_orderkey is unique),
      // so rank ≡ dense_rank ≡ row_number and all three outputs are the
      // one global position r. Compute r bucketed: range-bucket
      // totalprice (floor(/16384), bounded domain), per-bucket counts →
      // descending prefix offsets over the SMALL (status × bucket)
      // table (broadcast), r = offset + local row_number over the
      // (status, bucket) partition. Buckets respect the DESC order
      // (b1 > b2 ⟹ every price in b1 > every price in b2), so
      // offset + local position ≡ the global position the native
      // window assigns — hash-identical output, parallelism
      // O(statuses × buckets) instead of ≤3.
      val o = orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("b", floor(col("o_totalprice") / lit(16384.0)))
      val off = o.groupBy("o_orderstatus", "b").agg(count(lit(1)).as("c"))
        .withColumn("off", coalesce(sum(col("c")).over(
          Window.partitionBy("o_orderstatus").orderBy(col("b").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("o_orderstatus").as("st"), col("b").as("bb"), col("off"))
      o.join(broadcast(off),
          col("o_orderstatus") === col("st") && col("b") === col("bb"))
        .withColumn("r", col("off") + row_number().over(
          Window.partitionBy("o_orderstatus", "b")
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("r").as("rn"), col("r").as("rk"), col("r").as("drk"))
        .orderBy("o_orderstatus", "rn")
    },

    // Distribution functions; pr/cd are exact rational ratios of row
    // counts computed identically by both engines.
    OpQuery("q_window_percent_rank",
      """SELECT o_orderkey,
        |       percent_rank() OVER w AS pr,
        |       cume_dist()    OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      // Decomposed (round 20): PARTITION BY o_orderstatus has ≤3
      // distinct values at EVERY SF, so the native window funnels the
      // whole table into ≤3 tasks — the full-ledger sweep measured
      // 27.6 s solo at sf10, the suite's slowest entry, and at 1000
      // executors 3 tasks is a non-plan. Same decomposition as
      // q_window_ntile: range-bucket totalprice within each status,
      // per-bucket counts → prefix offsets over the SMALL
      // (status × bucket) table (broadcast), global rank = offset +
      // local row_number over the (status, bucket) partition —
      // parallelism O(statuses × buckets), no data-sized sort anywhere.
      // o_orderkey makes the window order total (no ties), so rank ≡
      // row_number and percent_rank = (r−1)/(n−1), cume_dist = r/n —
      // the exact integer divisions both engines evaluate natively
      // (bit-identical doubles); n = 1 yields 0 in both engines.
      val o = orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("b", floor(col("o_totalprice") / lit(16384.0)))
      val bc = o.groupBy("o_orderstatus", "b").agg(count(lit(1)).as("c"))
      val off = bc
        .withColumn("off", coalesce(sum(col("c")).over(
          Window.partitionBy("o_orderstatus").orderBy("b")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n", sum(col("c")).over(Window.partitionBy("o_orderstatus")))
        .select(col("o_orderstatus").as("st"), col("b").as("bb"),
          col("off"), col("n"))
      o.join(broadcast(off),
          col("o_orderstatus") === col("st") && col("b") === col("bb"))
        .withColumn("r", col("off") + row_number().over(
          Window.partitionBy("o_orderstatus", "b")
            .orderBy(col("o_totalprice"), col("o_orderkey"))))
        .select(col("o_orderkey"),
          when(col("n") === 1, lit(0.0))
            .otherwise((col("r") - 1).cast("double") /
              (col("n") - 1).cast("double")).as("pr"),
          (col("r").cast("double") / col("n").cast("double")).as("cd"))
        .orderBy("o_orderkey")
    },

    OpQuery("q_window_lag_lead",
      """SELECT event_id,
        |       lag(value)  OVER w AS prev_value,
        |       lead(value) OVER w AS next_value
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      events(s, d)
        .select(col("event_id"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"))
        .orderBy("event_id")
    },

    // Decimal accumulation: DuckDB evaluates windowed SUMs with segment
    // trees (different double-addition order than Spark's running fold),
    // so an exact decimal accumulator is the only order-independent twin.
    OpQuery("q_window_running",
      """SELECT event_id,
        |       CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS running_sum,
        |       CAST(count(*) OVER w AS BIGINT) AS running_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .select(col("event_id"),
          sum(dec(col("value"))).over(w).cast("double").as("running_sum"),
          count(lit(1)).over(w).as("running_n"))
        .orderBy("event_id")
    },

    OpQuery("q_window_moving_avg",
      """SELECT event_id,
        |       CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |         / count(*) OVER w AS mavg
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(-6, Window.currentRow)
      events(s, d)
        .select(col("event_id"),
          (sum(dec(col("value"))).over(w).cast("double") / count(lit(1)).over(w)).as("mavg"))
        .orderBy("event_id")
    },

    // Global NTILE without a global window: Spark executes an
    // un-partitioned OVER (ORDER BY ...) on a single partition — a
    // scale-killer for a corpus-wide quartile. Instead the global rank
    // is assembled two-level (per-value-bucket row_number + prefix-sum
    // of bucket counts, the same shape as the bucket-prune quantiles)
    // and NTILE's bucket is computed from (rank, n) in closed form:
    // the first n%4 tiles get ceil(n/4) rows, the rest floor(n/4).
    OpQuery("q_window_ntile",
      """SELECT o_orderkey, CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val o = orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("b", floor(col("o_totalprice") / lit(16384.0)))
      val bc = o.groupBy("b").agg(count(lit(1)).as("c"))
      val off = bc
        .withColumn("off", coalesce(sum(col("c")).over(
          Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n", sum(col("c")).over(Window.partitionBy(lit(1))))
        .select(col("b"), col("off"), col("n"))
      val size = (col("n") / 4).cast("long")
      val rem = col("n") % 4
      val quartile = when(size === 0, col("r"))
        .when(col("r") <= rem * (size + 1), ceil(col("r") / (size + 1)))
        .otherwise(rem + ceil((col("r") - rem * (size + 1)) / size))
      o.join(broadcast(off), "b")
        .withColumn("r", col("off") + row_number().over(
          Window.partitionBy("b").orderBy(col("o_totalprice"), col("o_orderkey"))))
        .select(col("o_orderkey"), quartile.cast("long").as("quartile"))
        .orderBy("o_orderkey")
    },

    OpQuery("q_window_first_last",
      """SELECT event_id,
        |       first_value(value) OVER w AS first_v,
        |       last_value(value)  OVER w AS last_v
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      events(s, d)
        .select(col("event_id"),
          first(col("value")).over(w).as("first_v"),
          last(col("value")).over(w).as("last_v"))
        .orderBy("event_id")
    },

    // NTH_VALUE over the full partition frame (round 13 — the one
    // analytic value-picker the family didn't name). The frame is
    // explicit on BOTH sides: the default running frame would make the
    // first row's nth NULL in both engines, but pinning the full frame
    // removes any default-frame ambiguity; the ORDER BY inside the
    // window ends in the unique event_id, so "2nd" and "3rd" are
    // well-defined under value ties.
    OpQuery("q_window_nth",
      """SELECT event_id,
        |       nth_value(value, 2) OVER w AS second_v,
        |       nth_value(value, 3) OVER w AS third_v
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      events(s, d)
        .select(col("event_id"),
          nth_value(col("value"), 2).over(w).as("second_v"),
          nth_value(col("value"), 3).over(w).as("third_v"))
        .orderBy("event_id")
    },

    // Top-N per group: rank inside the partition, then filter — the
    // standard distributed replacement for per-group ORDER BY ... LIMIT.
    OpQuery("q_topn_per_group",
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         CAST(row_number() OVER (PARTITION BY o_custkey
        |                                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("long").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },

    // Time-based RANGE frame: events in the trailing 10 minutes per
    // user. Both engines order by second-truncated epoch so the ns/µs
    // precision difference cannot move frame boundaries.
    OpQuery("q_window_time_range",
      """SELECT event_id,
        |       CAST(count(*) OVER (PARTITION BY user_id
        |                           ORDER BY CAST(epoch(time_bucket(INTERVAL '1 second', ts)) AS BIGINT)
        |                           RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_10min
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val sec = unix_seconds(date_trunc("second", col("ts")))
      val w = Window.partitionBy(col("user_id")).orderBy(sec)
        .rangeBetween(-600L, Window.currentRow)
      events(s, d)
        .select(col("event_id"), count(lit(1)).over(w).as("n_10min"))
        .orderBy("event_id")
    },

    // RANGE frame on a numeric (integer) ordering key.
    // Value-RANGE frame, reformulated as two prefix ranks: with unique
    // keys, count over RANGE [k-1000, k] = C(k) - C(k-1001) where C(v)
    // is the running count of keys <= v. Spark's sliding RANGE frame
    // re-accumulates the aggregate buffer every time the frame head
    // moves (O(n * avg_frame) updates — measured 21x DuckDB at sf0.1);
    // a running count is the incremental UnboundedPreceding frame, O(n).
    // C at the probe points k-1001 comes from interleaving one probe row
    // per key into the same sort (reals sort before probes on ties, so
    // C(v) is inclusive), and rank/below are paired back with a single
    // hash groupBy on the key instead of a self-join — the window output
    // is scanned once. The oracle keeps the plain RANGE-frame SQL: both
    // compute the identical exact counts.
    OpQuery("q_window_range_frame",
      s"""SELECT o_orderkey,
         |       CAST(count(*) OVER (ORDER BY o_orderkey
         |                        RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_close
         |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val keys = orders(s, d).select(col("o_orderkey").as("key"))
      val u = keys.select(col("key"), col("key").as("pos"), lit(0).as("tag"))
        .unionAll(keys.select(col("key"), (col("key") - 1001L).as("pos"), lit(1).as("tag")))
        .withColumn("b", floor(col("pos") / lit(16384.0)))
      // the running count itself is two-level (per-bucket cum + prefix
      // offsets) rather than one un-partitioned window, which Spark
      // would execute on a single partition — the parallel shape
      val bc = u.groupBy("b").agg(sum(lit(1) - col("tag")).as("creal"))
      val off = bc.withColumn("off", coalesce(sum(col("creal")).over(
        Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("b"), col("off"))
      val run = Window.partitionBy("b").orderBy(col("pos"), col("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.join(broadcast(off), "b")
        .withColumn("cnt", col("off") + sum(lit(1) - col("tag")).over(run))
        .groupBy("key")
        .agg(max(when(col("tag") === 0, col("cnt"))).as("rank"),
          max(when(col("tag") === 1, col("cnt"))).as("below"))
        .select(col("key").as("o_orderkey"),
          (col("rank") - col("below")).cast("long").as("n_close"))
        .orderBy("o_orderkey")
    }
  )
}
