package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement, LogicalPlan}

/** Safe SQL execution gateway (SURVEY.md §2 Tier A9/A10).
  *
  * The reference strips markdown fences off LLM output
  * (/root/reference/doc.py:217–223) and *promises* SELECT-only via the
  * prompt (doc.py:187) — a promise, not an enforcement. Here the gate is
  * structural: the statement is parsed with Catalyst's SQL parser and the
  * logical plan is rejected if it contains any command/DML node, then
  * executed with `spark.sql` (Catalyst replaces DuckDB end-to-end,
  * doc.py:240–243 analog).
  */
object SqlGateway {

  /** ```sql fences + whitespace stripping (doc.py:217–223 analog). */
  def sanitize(raw: String): String = {
    var s = raw.trim
    if (s.startsWith("```sql")) s = s.substring(6)
    else if (s.startsWith("```")) s = s.substring(3)
    if (s.endsWith("```")) s = s.substring(0, s.length - 3)
    s.trim
  }

  /** Read-only metadata statements a DuckDB user types at the prompt
    * (round 13): DESCRIBE and SHOW TABLES/COLUMNS inspect the catalog
    * and mutate nothing, so the SELECT-only gate admits them by node
    * name. Everything else that parses to a Command stays rejected. */
  private val ReadOnlyCommands = Set(
    "DescribeRelation", "DescribeColumn", "ShowTables", "ShowColumns")

  /** Structural SELECT-only enforcement: walk the parsed plan and reject
    * commands (DDL: CREATE/DROP/ALTER/…) and DML (INSERT/UPDATE/MERGE).
    * Subqueries/CTEs/set-ops all parse to non-Command query plans and pass.
    */
  def validate(spark: SparkSession, sql: String): LogicalPlan = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    // EXPLAIN is read-only: unwrap it and gate the INNER statement, so
    // `EXPLAIN SELECT …` works while `EXPLAIN DROP TABLE …` is rejected
    // exactly like the bare DROP (round 13).
    val toCheck = plan match {
      case e: org.apache.spark.sql.execution.command.ExplainCommand => e.logicalPlan
      case p => p
    }
    val offending = toCheck.collectFirst {
      case c: Command if !ReadOnlyCommands(c.nodeName) => c.nodeName
      case i: InsertIntoStatement   => i.nodeName
    }
    offending.foreach { node =>
      throw new SecurityException(s"Only SELECT queries are allowed; rejected $node")
    }
    plan
  }

  /** sanitize → dialect-accept → validate → execute.
    *
    * The dialect pass runs BEFORE validation so the structural
    * SELECT-only gate judges the statement Spark will actually execute;
    * it is a no-op on valid Spark SQL (every rewritten spelling —
    * strftime, list_*, `//`, epoch(), time_bucket — does not exist in
    * Spark SQL), closing the SURVEY §7.4-1 dialect-drift gap where a
    * user pasting DuckDB SQL (the reference's pinned dialect,
    * /root/reference/doc.py:186-188) got a parse error here. */
  def run(spark: SparkSession, rawSql: String): DataFrame = {
    val s0 = sanitize(rawSql)
    // DuckDB's SUMMARIZE statement (round 13): `SUMMARIZE <table>` or
    // `SUMMARIZE SELECT …` produces the per-column profile. The inner
    // query (if any) still passes through the dialect shim and the
    // structural SELECT-only gate — `SUMMARIZE DROP TABLE t` is
    // rejected exactly like `DROP TABLE t`.
    val Summarize = "(?is)^summarize\\b(.*)$".r
    s0 match {
      case Summarize(rest0) =>
        val rest = rest0.trim
        val df =
          if (rest.matches("[A-Za-z_][A-Za-z0-9_.]*")) spark.table(rest)
          else {
            val inner = DuckDbDialect.rewrite(rest)
            validate(spark, inner)
            spark.sql(inner)
          }
        Profile.summarize(df)
      case _ =>
        val sql = DuckDbDialect.rewrite(s0)
        validate(spark, sql)
        spark.sql(sql)
    }
  }
}
