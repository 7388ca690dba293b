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
}
