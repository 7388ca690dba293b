package graft.engine

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the engine.
  *
  * The reference (Arterning/ai-duckdb) runs an embedded DuckDB with default
  * settings, one connection per statement (/root/reference/doc.py:117,241).
  * Here one long-lived SparkSession plays DuckDB's role; Catalyst + AQE
  * replace DuckDB's optimizer/scheduler end-to-end (SURVEY.md §4).
  *
  * Config choices are scale-oriented, not demo-oriented:
  *  - shuffle.partitions = cores for local mode (on a real cluster this is
  *    sized to data volume; AQE coalesces post-shuffle partitions anyway),
  *  - AQE on for runtime re-planning (skew joins, broadcast demotion),
  *  - UTC session timezone so results are reproducible against the
  *    DuckDB oracle regardless of host timezone.
  */
object Session {
  def cores: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    Runtime.getRuntime.availableProcessors().toString).toInt

  /** Pin the JVM default locale to ROOT: Spark's string functions
    * (UTF8String.toLowerCaseSlow and friends) fall back to the JVM
    * DEFAULT locale for non-ASCII strings, so on e.g. a Turkish-locale
    * host `lower('I')` would yield dotless ı while DuckDB's
    * locale-independent lower yields 'i' — silently breaking oracle
    * hash comparisons and the dedup canonicalization. Called from every
    * JVM entry point that creates a session. */
  def pinLocale(): Unit =
    java.util.Locale.setDefault(java.util.Locale.ROOT)

  def local(appName: String = "graft"): SparkSession = {
    pinLocale()
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Udfs.register(spark)
    spark
  }
}
