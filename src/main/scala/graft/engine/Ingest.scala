package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-format ingestion → DataFrame (SURVEY.md §2 Tier A1–A6).
  *
  * Mirrors the reference's format surface (/root/reference/doc.py:16–83):
  * parquet, csv, json (three-tier fallback), xlsx/xls — plus flat
  * row-set XML, the reference's own roadmap format — re-expressed on
  * Spark readers so ingestion is distributed wherever the format allows:
  *
  *  - CSV/Parquet/JSONL: `spark.read`, fully parallel, schema inferred
  *    (pandas-inference analog, doc.py:41–49).
  *  - JSON top-level array / single object: `multiLine` Spark reader —
  *    still distributed per-file (doc.py:52–65 analog).
  *  - JSON dict-of-lists: transposed to columns with arrays_zip+explode
  *    (doc.py:69–71 analog) — the explode is distributed; only the
  *    single-row array parse is per-file.
  *  - xlsx: no Spark builtin and no POI offline; a minimal driver-side
  *    zip+XML parser (Xlsx.scala). The reference itself is driver-side
  *    pandas with a 16 MB upload cap (/root/reference/app.py:20), so this
  *    matches the reference's scale envelope; large tabular data arrives
  *    as parquet/csv in practice.
  *
  * Unsupported extensions / unparseable shapes throw
  * IllegalArgumentException (ValueError analog, doc.py:32,76).
  */
object Ingest {
  val SupportedExtensions: Set[String] =
    Set("parquet", "csv", "tsv", "xlsx", "xls", "json", "orc", "xml")

  /** Codec suffixes Spark's text readers decompress transparently —
    * stripped so `data.csv.gz` dispatches on the inner `.csv`. */
  private val CodecSuffixes = Set("gz", "bz2", "zst", "lz4", "snappy", "deflate")

  private[engine] def extension(path: String): String = {
    def last(p: String): String = {
      val i = p.lastIndexOf('.')
      if (i < 0) "" else p.substring(i + 1).toLowerCase
    }
    val e = last(path)
    if (CodecSuffixes.contains(e)) last(path.dropRight(e.length + 1)) else e
  }

  /** Format-dispatching loader (doc.py:16–83 analog). */
  def load(spark: SparkSession, path: String): DataFrame = {
    val df = extension(path) match {
      case "parquet"        => parquet(spark, path)
      case "orc"            => spark.read.orc(path)
      case "csv"            => csv(spark, path)
      case "tsv"            => csv(spark, path, sep = "\t")
      case "json"           => json(spark, path)
      // content-sniffed, not extension-trusted: a .xls saved by modern
      // Excel is often really OOXML (zip) and vice versa
      case "xlsx" | "xls"   =>
        if (Xls.isCfb(path)) Xls.read(spark, path) else Xlsx.read(spark, path)
      // flat row-set XML — the reference's roadmap format (README:104)
      case "xml"            => Xml.read(spark, path)
      case other =>
        throw new IllegalArgumentException(s"Unsupported file type: .$other " +
          s"(supported: ${SupportedExtensions.mkString(", ")})")
    }
    if (df.isEmpty)
      throw new IllegalArgumentException("File contains no data") // doc.py:78–79 analog
    df
  }

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Header + type inference, like pandas.read_csv (doc.py:45–46);
    * `sep` covers the TSV dialect through the same reader. */
  def csv(spark: SparkSession, path: String, sep: String = ","): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .option("sep", sep)
      .csv(path)

  /** Three-tier JSON fallback (doc.py:52–76 analog):
    * tier 1 — JSON-lines (distributed `spark.read.json`);
    * tier 2 — top-level array or single object (`multiLine` reader);
    * tier 3 — dict-of-lists → transpose to columns.
    * A scalar/unusable document throws (doc.py:76 analog).
    */
  def json(spark: SparkSession, path: String): DataFrame = {
    def corrupt(df: DataFrame): Boolean =
      df.columns.isEmpty || df.columns.sameElements(Array("_corrupt_record"))

    val jsonl = spark.read.json(path)
    if (!corrupt(jsonl)) {
      // partially-malformed JSONL: keep the good rows (DROPMALFORMED),
      // instead of surfacing a _corrupt_record column to the profile
      return if (jsonl.columns.contains("_corrupt_record"))
        spark.read.option("mode", "DROPMALFORMED").json(path)
      else jsonl
    }

    val multi = spark.read.option("multiLine", "true").json(path)
    if (corrupt(multi))
      throw new IllegalArgumentException(s"Unsupported JSON shape in $path")

    // dict-of-lists: multiLine parse yields exactly one row whose columns
    // are all arrays → transpose arrays to rows (doc.py:69–71 analog).
    val allArrays = multi.schema.fields.nonEmpty &&
      multi.schema.fields.forall(_.dataType.typeName == "array")
    if (allArrays && multi.count() == 1) transposeArrayRow(multi)
    else multi
  }

  /** One row of N equal-length arrays → N columns × len rows.
    * arrays_zip + explode keeps the transpose inside the plan (no
    * driver-side materialization of the values).
    */
  private def transposeArrayRow(df: DataFrame): DataFrame = {
    val cols = df.columns
    val zipped = df.select(explode(arrays_zip(cols.map(col).toIndexedSeq: _*)).as("r"))
    zipped.select(cols.map(c => col(s"r.$c").as(c)).toIndexedSeq: _*)
  }
}
