package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import Tables._

/** Time-window aggregation over the events table — the *batch twins* of
  * the Structured Streaming pipelines in graft.streaming (SURVEY.md §2
  * "Streaming"): tumbling, sliding, session windows, and time-bucketed
  * dedup. The streaming equivalents are validated against these in
  * StreamingSpec (batch–stream equivalence), and these in turn are
  * validated against DuckDB time_bucket/window-function oracles.
  *
  * events.ts is parquet timestamp[ns]; Spark reads µs, DuckDB ns — every
  * output formats timestamps at second granularity, where both agree.
  */
object EventWindows {

  val queries: Seq[OpQuery] = Seq(

    OpQuery("q_events_tumbling",
      s"""SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS wstart,
         |       event_type,
         |       CAST(COUNT(*) AS BIGINT) AS n,
         |       ${oSum("value")} AS sum_value
         |FROM events
         |GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type
         |ORDER BY wstart, event_type""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("wstart", "event_type")
    },

    // Sliding 1h window every 15min: each event belongs to 4 windows.
    // DuckDB twin materializes the 4 offsets explicitly — the same
    // expansion Spark's window() performs internally.
    OpQuery("q_events_sliding",
      s"""SELECT strftime(time_bucket(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes',
         |                '%Y-%m-%d %H:%M:%S') AS wstart,
         |       CAST(COUNT(*) AS BIGINT) AS n,
         |       ${oSum("value")} AS sum_value
         |FROM events, (VALUES (0), (1), (2), (3)) o(k)
         |GROUP BY 1 ORDER BY wstart""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
          col("n"), col("sum_value"))
        .orderBy("wstart")
    },

    // Session windows (30-minute gap) per user. DuckDB twin is the
    // classic lag/cumulative-sum sessionization; Spark uses the native
    // session_window operator — semantics coincide (new session when the
    // gap since the previous event is ≥ 30 minutes).
    OpQuery("q_events_session",
      """WITH marks AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |               OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marks)
        |SELECT user_id,
        |       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"))
        .orderBy("user_id", "session_start")
    },

    // Time-bucketed dedup — the batch twin of
    // dropDuplicatesWithinWatermark: one row per (user, type, minute).
    OpQuery("q_events_dedup",
      """SELECT DISTINCT user_id, event_type,
        |       strftime(time_bucket(INTERVAL '1 minute', ts), '%Y-%m-%d %H:%M:%S') AS minute
        |FROM events ORDER BY user_id, event_type, minute""".stripMargin) { (s, d) =>
      events(s, d)
        .select(col("user_id"), col("event_type"),
          date_format(date_trunc("minute", col("ts")), "yyyy-MM-dd HH:mm:ss").as("minute"))
        .distinct()
        .orderBy("user_id", "event_type", "minute")
    },

    // Time-series gap fill: per-user hourly grid from first to last
    // event, missing hours forward-filled with the last observed hourly
    // max. The IGNORE NULLS-free formulation (a running count of
    // non-null observations defines fill groups, then a per-group MAX)
    // is expressible identically on both engines.
    OpQuery("q_events_gapfill",
      s"""WITH hourly AS (
         |  SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS h,
         |         MAX(value) AS mx, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |spans AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY user_id),
         |grid AS (
         |  SELECT user_id, UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM spans),
         |joined AS (
         |  SELECT g.user_id, g.h, hr.mx, COALESCE(hr.n, 0) AS n_events,
         |         COUNT(hr.mx) OVER (PARTITION BY g.user_id ORDER BY g.h) AS grp
         |  FROM grid g LEFT JOIN hourly hr ON g.user_id = hr.user_id AND g.h = hr.h)
         |SELECT user_id, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, n_events,
         |       MAX(mx) OVER (PARTITION BY user_id, grp) AS filled_value
         |FROM joined ORDER BY user_id, hour""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // Everything expensive happens on the SPARSE hourly aggregate; the
      // dense grid is generated map-side by explode AFTER the fill value
      // is already known, so no join, window, or exchange ever carries
      // the output-sized frame (the 64x probe's superlinear spill came
      // from shuffling+sorting the dense grid twice).
      val hourly = events(s, d)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .agg(max(col("value")).as("mx"), count(lit(1)).as("n"))
      // ONE range exchange by user on the sparse frame: RangePartitioning
      // (user) satisfies both the window's ClusteredDistribution(user)
      // and — as a prefix — the final ORDER BY (user, hour)'s
      // OrderedDistribution, so the dense output needs only a local
      // (spillable, exchange-free) sort, never a global re-shuffle.
      val byUser = hourly.repartitionByRange(col("user_id"))
      val w = Window.partitionBy("user_id").orderBy("h")
      // forward fill = last non-null over a running frame on the sparse
      // rows; gap hours inherit their predecessor's fill by construction
      val fill = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byUser
        .withColumn("ffmx", last(col("mx"), ignoreNulls = true).over(fill))
        .withColumn("nxt", lead(col("h"), 1).over(w))
        // ORDER BY placed on the SPARSE frame, where it is physically
        // free (the window already emits rows range-partitioned by user
        // and sorted by (user, h), so EnsureRequirements elides both the
        // exchange and the sort). The explode is order-preserving and
        // hh spans [h, nxt) are disjoint and increasing, so the dense
        // output streams to the writer already in (user, hour) order —
        // the output-sized frame is never sorted, shuffled, or buffered,
        // which is what removed the 64x probe's superlinear spill.
        //
        // VERSION-FRAGILITY NOTE (deliberate trade): the dense output's
        // global (user, hour) order rests on three physical behaviors
        // Spark does not contract — the sparse Sort surviving the
        // optimizer, Generate/Project preserving row order, and collect
        // concatenating range partitions in order. They hold on Spark
        // 4.1 and are pinned by PlanAudit (plan shape) + the ordered
        // oracle hash (QueriesSpec/driver), so a Spark upgrade that
        // broke any of them fails the suite loudly. The "contractual"
        // alternative — orderBy(user_id, hh) on the DENSE frame — was
        // tried and measured: Generate does NOT propagate child
        // ordering, so EnsureRequirements inserts a real output-sized
        // range exchange + sort, exactly the superlinear 64x spill this
        // formulation exists to avoid. If an upgrade ever breaks the
        // streamed order, re-adding that orderBy is the correctness
        // fallback (at its measured cost) while the plan is re-pinned.
        .orderBy("user_id", "h")
        .select(col("user_id"), col("n"), col("ffmx"), col("h"),
          explode(sequence(col("h"),
            coalesce(col("nxt") - expr("interval 1 hour"), col("h")),
            expr("interval 1 hour"))).as("hh"))
        .select(col("user_id"),
          date_format(col("hh"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          when(col("hh") === col("h"), col("n")).otherwise(lit(0L)).as("n_events"),
          col("ffmx").as("filled_value"))
    },

    // Top event bursts: largest 1-minute counts — tumbling window + topk.
    OpQuery("q_events_bursts",
      """SELECT strftime(time_bucket(INTERVAL '1 minute', ts), '%Y-%m-%d %H:%M:%S') AS minute,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1
        |ORDER BY n DESC, minute LIMIT 10""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy(date_format(date_trunc("minute", col("ts")), "yyyy-MM-dd HH:mm:ss").as("minute"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("minute"))
        .limit(10)
    }
  )
}
