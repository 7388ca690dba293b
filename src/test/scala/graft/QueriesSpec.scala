package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + shape checks for every SparkEntry query on sf0.001. The value
  * comparison against DuckDB happens driver-side (t2) and in
  * tools/check_oracle.py — here we pin: every query runs, is
  * deterministic across two executions, and non-degenerate queries
  * return rows. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Queries allowed to be empty at this tiny scale factor. */
  private val mayBeEmpty = Set("q_sim_ann_lsh", "q_dedup_embedding", "q_join_anti")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs, deterministic, ${if (mayBeEmpty(name)) "≥0" else ">0"} rows") {
      val r1 = fn(spark, TestSpark.Sf).collect()
      if (!mayBeEmpty(name)) assert(r1.nonEmpty, s"$name returned no rows")
      val r2 = fn(spark, TestSpark.Sf).collect()
      assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq,
        s"$name not deterministic across runs")
    }
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; aliases exist for all columns") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // column names must be stable identifiers (driver sorts by name)
    SparkEntry.queries.foreach { case (name, fn) =>
      val cols = fn(spark, TestSpark.Sf).columns
      cols.foreach(c => assert(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"$name column '$c' is not a plain identifier"))
    }
  }

  // The CDF band count (round 18, replacing the r8 bucket+salt equi
  // join) rests on order-statistics arithmetic: n = le(s+500) −
  // lt(s−500) with inclusive edges, boundary probes inserted into the
  // value axis carrying zero mass, and pair-less suppliers dropped like
  // the oracle's inner join. Cross-check the whole result against the
  // definitionally-correct brute-force cross join at this SF.
  test("q_join_range equals the brute-force band join") {
    import org.apache.spark.sql.functions._
    import graft.ops.Tables
    val expected = Tables.customer(spark, TestSpark.Sf).select("c_acctbal")
      .crossJoin(Tables.supplier(spark, TestSpark.Sf).select("s_suppkey", "s_acctbal"))
      .filter(col("c_acctbal").between(col("s_acctbal") - 500, col("s_acctbal") + 500))
      .groupBy("s_suppkey").agg(count(lit(1)).as("n_cust"))
      .orderBy("s_suppkey").collect().map(_.toString).toSeq
    val actual = SparkEntry.queries("q_join_range")(spark, TestSpark.Sf)
      .collect().map(_.toString).toSeq
    assert(actual == expected)
  }

  // The gap-fill operator streams its dense output pre-ordered (no dense
  // sort in the plan — round 7); re-derive the full semantics driver-side
  // from the raw events: global (user, hour) order, contiguous hourly
  // grid per user, exact n_events, and last-observed-forward fill.
  test("q_events_gapfill: ordered, contiguous, correctly filled") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_events_gapfill")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) null else r.getDouble(3).asInstanceOf[Any]))
    assert(out.nonEmpty)
    // globally ordered as written (the driver compare is order-sensitive)
    assert(out.map(r => (r._1, r._2)).sameElements(
      out.map(r => (r._1, r._2)).sortBy(identity)), "output not (user, hour)-sorted")
    // reference fill from the raw events, computed independently
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
    val raw = graft.ops.Tables.events(spark, TestSpark.Sf)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant,
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val byUser = raw.groupBy(_._1)
    val expected = byUser.toSeq.flatMap { case (u, rows) =>
      val hourly = rows.groupBy(_._2).map { case (h, hr) =>
        val vals = hr.flatMap(_._3)
        (h, hr.length.toLong, if (vals.isEmpty) None else Some(vals.max))
      }.toSeq.sortBy(_._1)
      val (h0, h1) = (hourly.head._1, hourly.last._1)
      val obs = hourly.map(t => t._1 -> (t._2, t._3)).toMap
      var fill: Option[Double] = None
      Iterator.iterate(h0)(_.plusSeconds(3600)).takeWhile(!_.isAfter(h1)).map { h =>
        val (n, mx) = obs.getOrElse(h, (0L, None))
        if (mx.isDefined) fill = mx
        (u, fmt.format(h), n, fill.map(_.asInstanceOf[Any]).orNull)
      }.toSeq
    }.sortBy(r => (r._1, r._2))
    assert(out.toSeq == expected)
  }
}
