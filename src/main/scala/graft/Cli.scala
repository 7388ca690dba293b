package graft

import graft.engine._

/** Thin CLI over the engine shell (SURVEY.md §2 Tier A16;
  * /root/reference/main.py:5–29 analog): load a file, register it as
  * `data_table`, run a SQL query (or the NL→SQL stub when the input is
  * not SQL) through the SELECT-only gateway, print the profile and the
  * markdown-rendered result.
  *
  * Multi-source analysis (the reference's own roadmap item,
  * README.md:109–116): a comma-separated file list registers each file
  * under its sanitized stem (`sales.csv,dims.csv` → views `sales`,
  * `dims`; collisions suffixed `_2`, unusable stems fall back to
  * `data_table_k`), and the NL path routes through the multi-table
  * prompt so cross-file joins work from one question.
  *
  * Usage: runMain graft.Cli <data-file>[,<data-file>...] <sql-or-question>
  */
object Cli {
  /** View name for file i of n: the reference's fixed name for a single
    * file, sanitized stems for several. */
  private[graft] def viewNames(paths: Seq[String]): Seq[String] =
    if (paths.size == 1) Seq(Catalog.TableName)
    else {
      val used = scala.collection.mutable.Set.empty[String]
      paths.zipWithIndex.map { case (p, i) =>
        val stem = new java.io.File(p).getName.replaceAll("\\.[^.]*$", "")
          .replaceAll("[^A-Za-z0-9_]", "_").replaceAll("^([0-9])", "t$1")
        val base = if (stem.isEmpty || stem.forall(_ == '_'))
          s"data_table_${i + 1}" else stem
        var name = base; var k = 1
        while (!used.add(name)) { k += 1; name = s"${base}_$k" }
        name
      }
    }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.Cli <data-file>[,<data-file>...] <sql-or-question>")
    val paths = args(0).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val query = args.drop(1).mkString(" ")
    val spark = Session.local("graft-cli")

    val views = viewNames(paths)
    val tables = paths.zip(views).map { case (path, view) =>
      val df = Ingest.load(spark, path)
      Catalog.register(df, view)
      val info = Profile(df)
      println(s"$view: rows=${info.rowCount} cols=${info.columnCount} " +
        info.columns.map(c => s"$c:${info.dtypes(c)}").mkString("[", ", ", "]"))
      (view, info)
    }

    val sql =
      if (query.trim.toUpperCase.startsWith("SELECT") || query.trim.startsWith("```"))
        query
      else SqlGenerator.fromEnv().generateMulti(query, tables)
    println(s"sql> ${SqlGateway.sanitize(sql)}")

    val result = Results.materialize(SqlGateway.run(spark, sql))
    println(Results.toMarkdown(result))
    spark.stop()
  }
}
