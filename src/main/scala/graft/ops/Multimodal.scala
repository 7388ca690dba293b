package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._

/** Multimodal column plumbing (north-star scope, SURVEY.md §2): media
  * payloads are opaque `binary` columns + typed metadata structs; decode /
  * feature-extract / resize / frame-sample are *stubbed* with
  * deterministic fakes (no image/audio libs in this container), but the
  * Spark-side plumbing — schema, batch shape, partition-parallel
  * execution, pure-column expressions — is real and tested.
  *
  * A production deployment swaps [[fakeDecode]]/[[fakeFeatures]] for a
  * real codec (e.g. a JNI decoder or `mapInPandas`-style batch UDF); every
  * call site keeps the same schema contract.
  */
object Multimodal {

  /** media metadata contract: what a real decoder would emit. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** STUB decode: deterministic fake metadata derived from the raw bytes
    * (format from a fake magic byte, dimensions from the length). A real
    * implementation parses the container header instead. */
  def fakeDecode(bin: Column): Column = struct(
    element_at(array(lit("jpeg"), lit("png"), lit("wav")),
      (abs(xxhash64(bin)) % 3 + 1).cast("int")).as("format"),
    ((abs(xxhash64(bin)) % 1024) + 1).cast("int").as("width"),
    ((abs(xxhash64(bin, lit(1))) % 768) + 1).cast("int").as("height"),
    octet_length(bin).cast("long").as("n_bytes"))

  /** STUB feature extractor: 16-dim deterministic pseudo-embedding from
    * byte-level hashes — stands in for a vision/audio encoder, keeps the
    * array<double> schema and per-partition parallelism of the real op. */
  def fakeFeatures(bin: Column, dim: Int = 16): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (xxhash64(bin, i) % 1000).cast("double") / 1000.0)

  /** STUB resize: a real kernel maps bytes→bytes; the fake truncates,
    * preserving the binary type and the metadata update contract. */
  def fakeResize(bin: Column, maxBytes: Int): Column =
    substring(bin, 1, maxBytes)

  /** STUB frame sampler: every k-th 256-byte block as one "frame". */
  def fakeFrameSample(bin: Column, stride: Int): Column =
    transform(
      sequence(lit(0L),
        greatest((octet_length(bin) / (256 * stride)).cast("long") - 1, lit(0L))),
      i => substring(bin, (i * 256 * stride + 1).cast("int"), lit(256)))

  /** documents.text reinterpreted as a binary payload column — the
    * testdata carries no real media, so the text bytes stand in. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(col("doc_id"), col("text").cast("binary").as("payload"))

  val queries: Seq[OpQuery] = Seq(

    // Binary-column accounting with an exact oracle: byte length + sha256
    // digest are engine-independent; the decode stub itself is
    // hash-derived (no DuckDB twin) and is covered by MultimodalSpec.
    OpQuery("q_binary_meta",
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |       sha256(text) AS digest
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
          sha2(col("text").cast("binary"), 256).as("digest"))
        .orderBy("doc_id")
    },

    // Full stubbed pipeline: decode → filter on metadata → features.
    // Rows-only driver check; determinism asserted in MultimodalSpec.
    OpQuery.noOracle("q_media_pipeline") { (s, d) =>
      mediaTable(s, d)
        .withColumn("meta", fakeDecode(col("payload")))
        .filter(col("meta.n_bytes") > 100)
        .withColumn("features", fakeFeatures(col("payload")))
        .select(col("doc_id"), col("meta.format").as("format"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          round(aggregate(col("features"), lit(0.0), (a, x) => a + x), 6).as("feat_sum"))
        .orderBy("doc_id")
    }
  )
}
