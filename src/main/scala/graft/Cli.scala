package graft

import graft.engine._

/** Thin CLI over the engine shell (SURVEY.md §2 Tier A16;
  * /root/reference/main.py:5–29 analog): load a file, register it as
  * `data_table`, run a SQL query (or the NL→SQL stub when the input is
  * not SQL) through the SELECT-only gateway, print the profile and the
  * markdown-rendered result.
  *
  * Usage: runMain graft.Cli <data-file> <sql-or-question>
  */
object Cli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Cli <data-file> <sql-or-question>")
    val (path, query) = (args(0), args.drop(1).mkString(" "))
    val spark = Session.local("graft-cli")

    val df = Ingest.load(spark, path)
    Catalog.register(df)
    val info = Profile(df)
    println(s"rows=${info.rowCount} cols=${info.columnCount} " +
      info.columns.map(c => s"$c:${info.dtypes(c)}").mkString("[", ", ", "]"))

    val sql =
      if (query.trim.toUpperCase.startsWith("SELECT") || query.trim.startsWith("```"))
        query
      else SqlGenerator.fromEnv().generate(query, info)
    println(s"sql> ${SqlGateway.sanitize(sql)}")

    val result = Results.materialize(SqlGateway.run(spark, sql))
    println(Results.toMarkdown(result))
    spark.stop()
  }
}
