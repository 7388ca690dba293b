package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registration + persistence (SURVEY.md §2 Tier A8).
  *
  * The reference registers every uploaded file as the fixed table
  * `data_table` inside a per-file DuckDB database `data_{stem}.duckdb`
  * (/root/reference/doc.py:112–119). Spark-native analog:
  *  - session visibility = `createOrReplaceTempView("data_table")`,
  *  - durability          = parquet directory `data_{stem}.parquet`
  *    (columnar like the .duckdb file, but splittable/distributed).
  */
object Catalog {
  val TableName = "data_table"

  def register(df: DataFrame, name: String = TableName): Unit =
    df.createOrReplaceTempView(name)

  /** Persist next to the source file, like doc.py:113–114's db_path. */
  def persistPath(sourcePath: String): String = {
    val p = java.nio.file.Paths.get(sourcePath)
    val stem = Option(p.getFileName).map(_.toString.replaceAll("\\.[^.]*$", "")).getOrElse("data")
    val dir = Option(p.getParent).map(_.toString).getOrElse(".")
    s"$dir/data_$stem.parquet"
  }

  def persist(df: DataFrame, sourcePath: String): String = {
    val path = persistPath(sourcePath)
    df.write.mode("overwrite").parquet(path)
    path
  }

  def loadPersisted(spark: SparkSession, sourcePath: String): DataFrame =
    spark.read.parquet(persistPath(sourcePath))

  /** Hive-style partitioned persistence: one directory per value of the
    * partition column, so filters on it prune whole directories at scan
    * time (PartitionFilters in the plan) — the layout that turns a
    * 100 TB scan into a per-partition read. */
  def partitionedPersist(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Bucketed + sorted persistence: tables bucketed on their join key
    * with the same bucket count join WITHOUT a shuffle (no Exchange in
    * the plan) — the co-located-join layout a 100 TB fact/fact join
    * needs. Catalog-table form because bucketing metadata lives in the
    * table catalog, not the parquet files. */
  def bucketedPersist(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Full ingest→profile→register pipeline (analyze_file analog,
    * doc.py:86–131): returns the profile used for NL→SQL grounding.
    *
    * `registerView = false` skips the fixed-name registration: on a
    * SHARED long-lived session (WebServer upload path) a global
    * `data_table` is exactly the cross-request mutable state the
    * per-request views in ask_question avoid, so the web tier profiles
    * without registering. The default keeps the reference's
    * single-user CLI behavior.
    */
  def analyzeFile(spark: SparkSession, path: String,
      registerView: Boolean = true): DataInfo = {
    val df = Ingest.load(spark, path)
    if (registerView) register(df)
    Profile(df)
  }
}
