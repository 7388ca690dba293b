package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._

/** Multimodal column plumbing (north-star scope, SURVEY.md §2): media
  * payloads are opaque `binary` columns + typed metadata structs.
  *
  * Image decode / feature-extract / resize are REAL for the formats the
  * JDK's built-in ImageIO reads (PNG, JPEG, BMP, GIF — no external codec
  * libs required): [[decodeImage]], [[imageFeatures]], [[resizeImage]],
  * executor-side UDFs over the binary column, spec-tested against
  * in-test-generated images. Audio is REAL for the formats
  * javax.sound.sampled reads (WAV/AIFF/AU): [[decodeAudio]],
  * [[audioFeatures]] (per-segment RMS energy), spec-tested against a
  * generated sine-plus-silence WAV. Video is REAL for MJPEG-in-AVI — a
  * pure-JVM RIFF walker ([[parseAvi]]) reads the container header and
  * frame chunks, and ImageIO decodes the per-frame JPEGs
  * ([[decodeVideo]]/[[sampleFrames]]/[[videoFeatures]]), spec-tested
  * against an in-test-assembled AVI. The learned-encoder embedding is a
  * REAL (tiny) trained model: [[fitEncoder]] learns per-feature
  * standardization statistics from the corpus itself in one distributed
  * aggregation and [[encodeColumn]] applies them through a fixed
  * orthonormal projection — see the "learned encoder" section below.
  * The md5-derived fakes ([[fakeDecode]]/[[fakeFeatures]]) remain as the
  * provably-deterministic pipeline-shape stand-ins for vision/audio
  * codec models whose weights cannot exist in this container. Every
  * call site keeps the same schema contract either way.
  */
object Multimodal {

  /** media metadata contract: what a decoder emits. */
  val MediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  case class MediaMeta(format: String, width: Int, height: Int, n_bytes: Long)

  /** Magic-byte sniff for the containers ImageIO can read (PNG, JPEG,
    * GIF, BMP, TIFF). The decode UDF checks this before constructing
    * any ImageIO machinery: on a mixed corpus most payloads are not
    * images, and a per-row reader lookup + stream allocation for bytes
    * that can never decode measured ~2 s across 5 000 rows at sf0.1 —
    * the sniff is a handful of byte compares, which is also exactly
    * what a production decoder front-end does. WBMP (the one other
    * JDK-readable format) has no discriminating magic — its header is
    * two zero bytes — so it is deliberately treated as non-image here. */
  private def hasImageMagic(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P'.toByte && b(2) == 'N'.toByte && b(3) == 'G'.toByte) ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) || // JPEG SOI
      (b(0) == 'G'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte) ||
      (b(0) == 'B'.toByte && b(1) == 'M'.toByte) ||
      (b(0) == 'I'.toByte && b(1) == 'I'.toByte && b(2) == 0x2A.toByte && b(3) == 0) || // TIFF LE
      (b(0) == 'M'.toByte && b(1) == 'M'.toByte && b(2) == 0 && b(3) == 0x2A.toByte))   // TIFF BE

  /** REAL image decode (JDK ImageIO): container format + pixel
    * dimensions from the header; null for bytes no reader accepts.
    * Runs on executors, one image per row — decode cost dwarfs UDF
    * overhead, so a batch UDF would buy nothing here. */
  val decodeImage: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      // catch-all: bytes with a recognized magic but a corrupt body make
      // ImageIO THROW (not return null); a bad payload row must yield
      // null, never fail the whole query
      if (bytes == null || !hasImageMagic(bytes)) null
      else try {
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          if (!readers.hasNext) null
          else {
            val r = readers.next()
            r.setInput(in)
            try MediaMeta(r.getFormatName.toLowerCase, r.getWidth(0),
              r.getHeight(0), bytes.length.toLong)
            finally r.dispose()
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => null }
    }

  /** REAL 16-dim image feature: 4×4 center-sampled grayscale (0..1) —
    * a deterministic, codec-backed stand-in for a learned encoder with
    * the same array<double> schema. Null for undecodable bytes. */
  val imageFeatures: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      val img = if (bytes == null) null
        else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) null
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        (0 until 4).flatMap { y =>
          (0 until 4).map { x =>
            val px = img.getRGB(math.min(w - 1, x * w / 4 + w / 8),
              math.min(h - 1, y * h / 4 + h / 8))
            val r = (px >> 16) & 0xFF; val g = (px >> 8) & 0xFF; val b = px & 0xFF
            (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
          }
        }.toArray
      }
    }

  /** REAL resize (JDK ImageIO + bilinear draw): bytes → PNG bytes at the
    * target box, preserving aspect ratio. Null for undecodable bytes. */
  val resizeImage: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte], maxW: Int, maxH: Int) =>
      val img = if (bytes == null) null
        else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) null
      else {
        val scale = math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight)
        val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
          math.max(1, (img.getHeight * scale).toInt))
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val gfx = out.createGraphics()
        gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        gfx.drawImage(img, 0, 0, w, h, null)
        gfx.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    }

  case class AudioMeta(format: String, sample_rate: Int, channels: Int,
      n_frames: Long, n_bytes: Long)

  /** REAL audio decode (JDK javax.sound.sampled — WAV/AIFF/AU): encoding
    * name, sample rate, channels, frame count from the RIFF/container
    * header; null for bytes no reader accepts. */
  val decodeAudio: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes))
        val f = aff.getFormat
        AudioMeta(aff.getType.toString.toLowerCase, f.getSampleRate.toInt,
          f.getChannels, aff.getFrameLength.toLong, bytes.length.toLong)
      } catch { case scala.util.control.NonFatal(_) => null }
    }

  /** REAL 16-dim audio feature: RMS energy (0..1) over 16 equal time
    * segments of the decoded PCM stream — the audio analog of
    * [[imageFeatures]]. 16-bit little-endian PCM; null when the bytes
    * don't decode. */
  val audioFeatures: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val pcm = in.readAllBytes()
          val bytesPerSample = fmt.getSampleSizeInBits / 8
          val n = pcm.length / bytesPerSample
          if (n == 0 || bytesPerSample != 2) null
          else {
            val seg = math.max(1, n / 16)
            (0 until 16).map { s =>
              val from = s * seg
              val to = math.min(n, from + seg)
              if (from >= to) 0.0
              else {
                var sum = 0.0
                var i = from
                while (i < to) {
                  val lo = pcm(2 * i) & 0xFF
                  val hi = pcm(2 * i + 1).toInt
                  val v = ((hi << 8) | lo) / 32768.0
                  sum += v * v
                  i += 1
                }
                math.sqrt(sum / (to - from))
              }
            }.toArray
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => null }
    }

  case class VideoMeta(format: String, width: Int, height: Int,
      n_frames: Long, us_per_frame: Long, n_bytes: Long)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** REAL minimal RIFF/AVI walker (pure JVM — byte offsets only, no
    * codec libs): the `avih` main header gives dimensions / frame count /
    * frame duration, and the `movi` list's `##dc`/`##db` chunks are the
    * per-frame payloads — for MJPEG AVIs each one is a standalone JPEG
    * that ImageIO decodes. Returns (header meta, frame byte-ranges);
    * None for anything that isn't a RIFF AVI. Bounds-checked so corrupt
    * payloads return None instead of throwing. */
  private[graft] def parseAvi(bytes: Array[Byte]): Option[(VideoMeta, Seq[(Int, Int)])] = {
    if (bytes == null || bytes.length < 12 ||
      fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ") return None
    var meta: Option[VideoMeta] = None
    val frames = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var i = from
      while (i + 8 <= to) {
        val id = fourcc(bytes, i)
        val sz = le32(bytes, i + 4)
        val dataStart = i + 8
        if (sz < 0 || sz > to - dataStart) return // truncated/corrupt chunk
        val dataEnd = dataStart + sz.toInt
        if (id == "LIST" && dataEnd - dataStart >= 4 && depth < 8)
          walk(dataStart + 4, dataEnd, depth + 1) // skip the list type tag
        else if (id == "avih" && sz >= 40)
          meta = Some(VideoMeta("avi",
            le32(bytes, dataStart + 32).toInt, le32(bytes, dataStart + 36).toInt,
            le32(bytes, dataStart + 16), le32(bytes, dataStart), bytes.length.toLong))
        else if (id(0).isDigit && id(1).isDigit &&
          (id.endsWith("dc") || id.endsWith("db")))
          frames += ((dataStart, dataEnd))
        i = dataEnd + (sz.toInt & 1) // chunks are padded to even offsets
      }
    }
    walk(12, bytes.length, 0)
    meta.map(m => (m, frames.toSeq))
  }

  /** REAL video decode: container metadata from the AVI main header;
    * null for bytes that aren't a RIFF AVI. */
  val decodeVideo: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte]) =>
      try parseAvi(bytes).map(_._1).orNull
      catch { case scala.util.control.NonFatal(_) => null }
    }

  /** REAL frame sampler: every `stride`-th frame chunk's bytes (for
    * MJPEG, standalone JPEGs) — the map-side cost is O(sampled bytes),
    * not O(video), which is what a 100 TB video corpus needs. */
  val sampleFrames: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte], stride: Int) =>
      try parseAvi(bytes).map { case (_, fs) =>
        val k = math.max(1, stride)
        fs.zipWithIndex.collect { case ((a, b), i) if i % k == 0 =>
          java.util.Arrays.copyOfRange(bytes, a, b)
        }.toArray
      }.orNull catch { case scala.util.control.NonFatal(_) => null }
    }

  /** REAL per-frame feature: mean grayscale of each sampled frame (≤16
    * frames), ImageIO-decoded — the video analog of [[imageFeatures]].
    * Frames that fail to decode contribute null-safe 0.0. */
  val videoFeatures: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (bytes: Array[Byte], stride: Int) =>
      try parseAvi(bytes).map { case (_, fs) =>
        val k = math.max(1, stride)
        fs.zipWithIndex.collect { case ((a, b), i) if i % k == 0 => (a, b) }
          .take(16)
          .map { case (a, b) =>
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
                bytes, a, b - a))
              catch { case scala.util.control.NonFatal(_) => null }
            if (img == null) 0.0
            else {
              // subsample an 8×8 grid — bounded per-frame cost
              val (w, h) = (img.getWidth, img.getHeight)
              var sum = 0.0
              for (y <- 0 until 8; x <- 0 until 8) {
                val px = img.getRGB(math.min(w - 1, x * w / 8 + w / 16),
                  math.min(h - 1, y * h / 8 + h / 16))
                val r = (px >> 16) & 0xFF; val g = (px >> 8) & 0xFF; val bb = px & 0xFF
                sum += (0.299 * r + 0.587 * g + 0.114 * bb) / 255.0
              }
              sum / 64.0
            }
          }.toArray
      }.orNull catch { case scala.util.control.NonFatal(_) => null }
    }

  /** Value of one hex digit of a lowercase digest string (1-based
    * position): '0'..'9' → 0..9, 'a'..'f' → 10..15. Pure arithmetic on
    * the char code, so the identical expression is writable in any SQL
    * engine — which is what lets the fake-decode pipeline carry a real
    * DuckDB oracle. */
  private def hexDigit(h: Column, i: Int): Column = {
    val a = ascii(substring(h, i, 1))
    when(a <= 57, a - 48).otherwise(a - 87)
  }

  /** Integer value of `len` hex chars of `h` starting at 1-based `start`. */
  private[graft] def hexWindow(h: Column, start: Int, len: Int): Column =
    (start until start + len).map(hexDigit(h, _)).reduceLeft((acc, d) => acc * 16 + d)

  /** STUB decode: deterministic fake metadata derived from md5(bytes) —
    * format from hex digit 1, width/height from 16-bit hex windows
    * aligned at chars 5–8 and 9–12 (the same windows the feature
    * extractor reads, so the oracle SQL computes each window once). A
    * real implementation parses the container header instead; md5 (not
    * xxhash64) keeps the derivation bitwise-reproducible in DuckDB, so
    * the full pipeline is oracle-checked rather than rows-only. */
  def fakeDecode(bin: Column): Column = {
    val h = md5(bin)
    struct(
      element_at(array(lit("jpeg"), lit("png"), lit("wav")),
        (hexWindow(h, 1, 1) % 3 + 1).cast("int")).as("format"),
      (hexWindow(h, 5, 4) % 1024 + 1).cast("int").as("width"),
      (hexWindow(h, 9, 4) % 768 + 1).cast("int").as("height"),
      octet_length(bin).cast("long").as("n_bytes"))
  }

  /** STUB feature extractor: deterministic pseudo-embedding (≤16 dims)
    * from the 4-hex-char windows of md5(bytes) (dims 0–7) and
    * md5(bytes ++ "x") (dims 8–15) — stands in for a vision/audio
    * encoder, keeps the array<double> schema and per-partition
    * parallelism of the real op, and is expressible in oracle SQL. */
  def fakeFeatures(bin: Column, dim: Int = 16): Column = {
    require(dim >= 1 && dim <= 16, "fake encoder emits at most 16 dims")
    val h1 = md5(bin)
    val h2 = md5(concat(bin, lit("x").cast("binary")))
    array((0 until dim).map { i =>
      val h = if (i < 8) h1 else h2
      (hexWindow(h, 1 + 4 * (i % 8), 4) % 1000).cast("double") / 1000.0
    }: _*)
  }

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

  // ------------------------------------------------------------------
  // LEARNED encoder — a real (tiny) trained model, not a stub.
  //
  // The encoder is z-score standardization LEARNED from the corpus
  // (per-feature mean/std from one distributed aggregation over exact
  // integer sums) followed by a fixed 4x4 orthonormal projection
  // (Hadamard/2) and L2 normalization. That is the smallest honest
  // instance of the fit/transform contract a production encoder has:
  //   fit       one map-side-combinable pass, O(features^2) driver state
  //   transform per-row narrow map with literal weights (codegen'd)
  // and both phases are exactly expressible in any SQL engine, so the
  // full fit+transform pipeline carries a strict DuckDB hash oracle
  // (q_media_learned_encoder) instead of the weaker spec-only pin.
  //
  // The training statistics use exact BIGINT sums (sum, sum-of-squares)
  // so the learned weights are bit-identical regardless of aggregation
  // order — the same trick the fixed-point money sums use. The variance
  // is then derived in ONE canonical double-arithmetic shape, written
  // identically here and in the oracle SQL:  (q - s*s/n) / (n-1).
  // At 100 TB the fit is one shuffle of 9 longs; sum(c*c) of 64-bit
  // counts would need the sums recast to double first (documented, not
  // needed at any test SF).
  //
  // Features are byte-stream summary counts of the payload's text view
  // (length, spaces, latin letters, vowels) — simple enough that the
  // "model" stays a literal arithmetic expression; the POINT here is
  // the trained fit/transform plumbing, the codec-backed embeddings
  // above ([[imageFeatures]]/[[audioFeatures]]/[[videoFeatures]]) stay
  // the content-aware feature extractors.

  /** Per-payload integer feature counts (the encoder's input layer).
    * Expects a string column; binary payloads go through
    * `CAST(payload AS STRING)` (UTF-8), the inverse of [[mediaTable]]. */
  private def featExprs(t: Column): Seq[Column] = Seq(
    length(t).cast("long"),
    (length(t) - length(regexp_replace(t, " ", ""))).cast("long"),
    (length(t) - length(regexp_replace(t, "[a-z]", ""))).cast("long"),
    (length(t) - length(regexp_replace(t, "[aeiou]", ""))).cast("long"))

  private val FeatNames = Seq("c_len", "c_space", "c_lower", "c_vowel")

  /** Fixed orthonormal projection (Hadamard matrix / 2): mixes the four
    * standardized features into four decorrelated output dims without
    * changing distances — the learned part of the model is the
    * standardization, exactly as in a "whiten + frozen head" encoder. */
  private[graft] val Proj: Seq[Seq[Double]] = Seq(
    Seq(0.5, 0.5, 0.5, 0.5),
    Seq(0.5, -0.5, 0.5, -0.5),
    Seq(0.5, 0.5, -0.5, -0.5),
    Seq(0.5, -0.5, -0.5, 0.5))

  /** A fitted encoder: per-feature mean/std learned from a corpus. */
  final case class TextEncoderModel(nDocs: Long, mean: Array[Double], std: Array[Double])

  /** Checked overflow bound for the exact-integer sums: every feature
    * count is ≤ the payload length, so sum-of-squares ≤ n·maxLen². If
    * that bound reaches 2⁶³ the long accumulators MAY have wrapped
    * silently and the learned weights would be garbage — refuse with
    * the remedy instead. (BigInt arithmetic: n·maxLen² itself overflows
    * a long exactly in the corpora this guards against.) The bound is
    * conservative — a corpus that trips it needs the documented
    * recast-sums-to-double fit, which trades bit-exactness for range. */
  private[graft] def requireSumsFit(n: Long, maxLen: Long): Unit =
    require(BigInt(n) * BigInt(maxLen) * BigInt(maxLen) <= BigInt(Long.MaxValue),
      s"fitEncoder: n=$n docs with max payload length $maxLen can overflow " +
        "the exact BIGINT sum-of-squares (n*maxLen^2 >= 2^63); recast the " +
        "fit sums to double (documented in the learned-encoder notes) for " +
        "corpora of this size")

  /** Fit the encoder on a corpus: one distributed aggregation (count +
    * exact per-feature sum / sum-of-squares + max length for the
    * overflow guard), 10 longs collected — the bounded "model
    * checkpoint" a real trainer would also materialize on the driver. */
  def fitEncoder(df: DataFrame, textCol: Column): TextEncoderModel = {
    val f = df.select(featExprs(textCol).zip(FeatNames).map { case (c, n) => c.as(n) }: _*)
    val aggs = count(lit(1)).as("n") +: max(col("c_len")).as("m_len") +:
      FeatNames.flatMap(n => Seq(sum(col(n)).as(s"s_$n"), sum(col(n) * col(n)).as(s"q_$n")))
    val r = f.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getAs[Long]("n")
    requireSumsFit(n, math.max(1L, r.getAs[Long]("m_len")))
    val (mean, std) = FeatNames.map { fn =>
      val s = r.getAs[Long](s"s_$fn").toDouble
      val q = r.getAs[Long](s"q_$fn").toDouble
      // degenerate corpora produce std = 0 (never NaN): n = 1 makes the
      // sample variance 0/0, and the exact-integer numerator can only be
      // <= 0 for a constant feature — encodeColumn's std == 0 guard then
      // zeroes the dim, mirroring the in-plan query's CASE
      val v = q - s * s / n
      (s / n, if (n <= 1 || v <= 0.0) 0.0 else math.sqrt(v / (n - 1)))
    }.unzip
    TextEncoderModel(n, mean.toArray, std.toArray)
  }

  /** Apply a fitted encoder to a string column: standardize with the
    * learned (literal → codegen'd) weights, project, L2-normalize,
    * round to 6 dp. Emits `array<double>` of 4 dims; an all-zero
    * feature deviation (or a degenerate constant feature) yields the
    * zero vector rather than NaN. */
  def encodeColumn(m: TextEncoderModel, t: Column): Column = {
    val zs = featExprs(t).zipWithIndex.map { case (c, i) =>
      if (m.std(i) == 0.0) lit(0.0)
      else (c.cast("double") - lit(m.mean(i))) / lit(m.std(i))
    }
    val es = Proj.map(row =>
      row.zip(zs).map { case (w, z) => lit(w) * z }.reduceLeft(_ + _))
    val nrm = sqrt(es.map(e => e * e).reduceLeft(_ + _))
    array(es.map(e => round(when(nrm === 0.0, 0.0).otherwise(e / nrm), 6)): _*)
  }

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

    // Full pipeline: decode → filter on metadata → features. This
    // oracle-backed query uses the md5-derived STUB decoder directly:
    // the hash compare requires PROVABLE determinism, and a
    // real-codec-first fallback chain only had an empirical one — a
    // text payload starting with an ASCII-printable magic ('BM', 'GIF',
    // TIFF 'II*') could in principle let ImageIO parse a bogus header
    // and diverge width/height/format from the stub oracle on a future
    // corpus. The real codecs (magic-sniffed ImageIO/javax.sound/AVI
    // walker) remain first-class library operators, spec-driven on real
    // media in MultimodalSpec; this query pins the pipeline SHAPE
    // (decode → metadata filter → feature extract → aggregate) with an
    // oracle that recomputes the stub's md5-hex-window derivation in
    // DuckDB SQL — md5 of the same UTF-8 bytes is bitwise-identical
    // across engines, and each feature value is an exact multiple of
    // 1/1000, so the 16-term sum rounds identically at 6 dp regardless
    // of summation order.
    OpQuery("q_media_pipeline",
      """WITH base AS (
        |  SELECT doc_id, md5(text) AS h1, md5(text || 'x') AS h2,
        |         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        |  FROM documents),
        |hx AS (
        |  SELECT doc_id, n_bytes,
        |         list_transform(range(0, 16), i ->
        |           list_sum(list_transform(range(0, 4), j ->
        |             (CASE WHEN ascii(substr(CASE WHEN i < 8 THEN h1 ELSE h2 END,
        |                                     CAST(1 + 4 * (i % 8) + j AS INT), 1)) <= 57
        |                   THEN ascii(substr(CASE WHEN i < 8 THEN h1 ELSE h2 END,
        |                                     CAST(1 + 4 * (i % 8) + j AS INT), 1)) - 48
        |                   ELSE ascii(substr(CASE WHEN i < 8 THEN h1 ELSE h2 END,
        |                                     CAST(1 + 4 * (i % 8) + j AS INT), 1)) - 87 END)
        |             * CAST(pow(16, 3 - j) AS BIGINT)))) AS w
        |  FROM base)
        |SELECT doc_id,
        |       (['jpeg', 'png', 'wav'])[CAST((w[1] // 4096) % 3 AS INT) + 1] AS format,
        |       CAST(w[2] % 1024 + 1 AS INT) AS width,
        |       CAST(w[3] % 768 + 1 AS INT) AS height,
        |       round(list_sum(list_transform(w, x -> (x % 1000) / 1000.0)), 6) AS feat_sum
        |FROM hx WHERE n_bytes > 100 ORDER BY doc_id""".stripMargin) { (s, d) =>
      mediaTable(s, d)
        .withColumn("meta", fakeDecode(col("payload")))
        .filter(col("meta.n_bytes") > 100)
        .withColumn("features", fakeFeatures(col("payload")))
        .select(col("doc_id"), col("meta.format").as("format"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          round(aggregate(col("features"), lit(0.0), (a, x) => a + x), 6).as("feat_sum"))
        .orderBy("doc_id")
    },

    // Perceptual-hash near-dup detection over the binary payload — the
    // image-dedup stage of a multimodal pipeline (pHash: downscale →
    // DCT → sign bits; two re-encodes/crops of one image differ in few
    // bits). The STUB transform replaces the pixel DCT with md5 nibbles
    // of 15 FIXED 64-char content windows (4 bits per window → a 60-bit
    // hash), preserving the structural property the real pHash has and
    // the join needs: each bit region depends on a LOCAL region of the
    // content, so payloads sharing most windows land within small
    // Hamming distance. Candidate generation reuses the Manku C(6,3)
    // block keys pinned by q_dedup_simhash/PropertySpec (complete for
    // Hamming ≤ 3, collisions N²/2³⁰); the oracle verifies with an
    // exact all-pairs join — obviously correct at oracle scale, and the
    // hash compare then proves the banded path finds exactly the same
    // pairs. The payload must cover every window (length ≥ 240 = 15
    // windows × 16 chars): a shorter payload hashes empty tail
    // windows, making ALL short payloads mutual near-dups — a
    // quadratic OUTPUT class the 64× ladder measured at 956 s before
    // the gate (production pHash pipelines gate on minimum image size
    // for exactly this reason: every tiny thumbnail "looks alike" once
    // downscaled). Scale shape: per-doc map → 20N explode → key-equi
    // join; no corpus broadcast anywhere.
    OpQuery("q_media_phash_dedup",
      """WITH ph AS (
        |  SELECT doc_id,
        |         CAST(list_sum(list_transform(range(0, 15), b ->
        |           CAST('0x' || substr(md5(substr(text, CAST(1 + 16 * b AS INT), 16)), 1, 1) AS BIGINT)
        |           * CAST(pow(16, b) AS BIGINT))) AS BIGINT) AS ph
        |  FROM documents WHERE length(text) >= 240)
        |SELECT x.doc_id AS id_a, y.doc_id AS id_b,
        |       CAST(bit_count(xor(x.ph, y.ph)) AS BIGINT) AS hamming
        |FROM ph x JOIN ph y ON x.doc_id < y.doc_id
        |WHERE bit_count(xor(x.ph, y.ph)) <= 3
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val phash = (0 until 15).map { b =>
        conv(substring(md5(substring(col("text"), 1 + 16 * b, 16)), 1, 1), 16, 10)
          .cast("long") * lit(1L << (4 * b))
      }.reduce(_ + _)
      val sig = documents(s, d).filter(length(col("text")) >= 240)
        .select(col("doc_id"), phash.as("ph")).cache()
      val blocks = sig.select(col("doc_id"), col("ph"),
        explode(array(Dedup.simhashBlockKeys(col("ph")): _*)).as("bkey"))
      blocks.as("x").join(blocks.as("y"),
          col("x.bkey") === col("y.bkey") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
          bit_count(col("x.ph").bitwiseXOR(col("y.ph"))).cast("long").as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("id_a", "id_b")
    },

    // Learned encoder, fit+transform in one plan: the training
    // aggregation is the 1-row scalar-subquery pattern (bounded 9-long
    // broadcast), the transform a per-row narrow map — at 100 TB the
    // fit is one shuffle of 9 longs and the transform never shuffles.
    // Exact integer sums make the learned weights order-independent;
    // the double arithmetic deriving mean/std/z/e/norm is written in
    // the SAME canonical shape here and in the oracle (left-assoc,
    // casts in the same places), so the hash compare is strict. The
    // LearnedEncoderSpec pins that this in-plan path is bit-identical
    // to the reusable fitEncoder/encodeColumn model API.
    OpQuery("q_media_learned_encoder",
      """WITH f AS (
        |  SELECT doc_id,
        |         CAST(length(text) AS BIGINT) AS c_len,
        |         CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS c_space,
        |         CAST(length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS BIGINT) AS c_lower,
        |         CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS c_vowel
        |  FROM documents),
        |st AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         SUM(c_len) AS s1, SUM(c_len * c_len) AS q1,
        |         SUM(c_space) AS s2, SUM(c_space * c_space) AS q2,
        |         SUM(c_lower) AS s3, SUM(c_lower * c_lower) AS q3,
        |         SUM(c_vowel) AS s4, SUM(c_vowel * c_vowel) AS q4
        |  FROM f),
        |z AS (
        |  SELECT doc_id,
        |         CASE WHEN n <= 1 OR CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n <= 0 THEN 0.0
        |              ELSE (CAST(c_len AS DOUBLE) - CAST(s1 AS DOUBLE) / n) / sqrt((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)) END AS z1,
        |         CASE WHEN n <= 1 OR CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n <= 0 THEN 0.0
        |              ELSE (CAST(c_space AS DOUBLE) - CAST(s2 AS DOUBLE) / n) / sqrt((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n) / (n - 1)) END AS z2,
        |         CASE WHEN n <= 1 OR CAST(q3 AS DOUBLE) - CAST(s3 AS DOUBLE) * s3 / n <= 0 THEN 0.0
        |              ELSE (CAST(c_lower AS DOUBLE) - CAST(s3 AS DOUBLE) / n) / sqrt((CAST(q3 AS DOUBLE) - CAST(s3 AS DOUBLE) * s3 / n) / (n - 1)) END AS z3,
        |         CASE WHEN n <= 1 OR CAST(q4 AS DOUBLE) - CAST(s4 AS DOUBLE) * s4 / n <= 0 THEN 0.0
        |              ELSE (CAST(c_vowel AS DOUBLE) - CAST(s4 AS DOUBLE) / n) / sqrt((CAST(q4 AS DOUBLE) - CAST(s4 AS DOUBLE) * s4 / n) / (n - 1)) END AS z4
        |  FROM f, st),
        |e AS (
        |  SELECT doc_id,
        |         0.5 * z1 + 0.5 * z2 + 0.5 * z3 + 0.5 * z4 AS e0,
        |         0.5 * z1 - 0.5 * z2 + 0.5 * z3 - 0.5 * z4 AS e1,
        |         0.5 * z1 + 0.5 * z2 - 0.5 * z3 - 0.5 * z4 AS e2,
        |         0.5 * z1 - 0.5 * z2 - 0.5 * z3 + 0.5 * z4 AS e3
        |  FROM z),
        |nr AS (
        |  SELECT doc_id, e0, e1, e2, e3,
        |         sqrt(e0 * e0 + e1 * e1 + e2 * e2 + e3 * e3) AS nrm
        |  FROM e)
        |SELECT doc_id,
        |       round(CASE WHEN nrm = 0 THEN 0.0 ELSE e0 / nrm END, 6) AS v0,
        |       round(CASE WHEN nrm = 0 THEN 0.0 ELSE e1 / nrm END, 6) AS v1,
        |       round(CASE WHEN nrm = 0 THEN 0.0 ELSE e2 / nrm END, 6) AS v2,
        |       round(CASE WHEN nrm = 0 THEN 0.0 ELSE e3 / nrm END, 6) AS v3
        |FROM nr ORDER BY doc_id""".stripMargin) { (s, d) =>
      val txt = col("payload").cast("string")
      val f = mediaTable(s, d).select(
        col("doc_id") +:
          featExprs(txt).zip(FeatNames).map { case (c, n) => c.as(n) }: _*)
      val aggs = count(lit(1)).cast("long").as("n") +:
        FeatNames.zipWithIndex.flatMap { case (fn, i) =>
          Seq(sum(col(fn)).as(s"s${i + 1}"), sum(col(fn) * col(fn)).as(s"q${i + 1}"))
        }
      val st = f.agg(aggs.head, aggs.tail: _*)
      val zs = FeatNames.zipWithIndex.map { case (fn, i) =>
        val (sC, qC, nC) = (col(s"s${i + 1}").cast("double"), col(s"q${i + 1}").cast("double"), col("n"))
        // degenerate guard, same canonical shape as the oracle's CASE:
        // a single-doc corpus or a zero-variance feature would make the
        // unguarded z a 0/0 (NULL in both engines, nulling every output
        // row) — encodeColumn zeroes the dim instead, and the in-plan
        // path must keep the model-API bit-identity on such corpora
        when(nC <= 1 || qC - sC * col(s"s${i + 1}") / nC <= 0.0, lit(0.0))
          .otherwise((col(fn).cast("double") - sC / nC) /
            sqrt((qC - sC * col(s"s${i + 1}") / nC) / (nC - lit(1)))).as(s"z${i + 1}")
      }
      val z = f.crossJoin(broadcast(st)).select(col("doc_id") +: zs: _*)
      val es = Proj.zipWithIndex.map { case (row, j) =>
        row.zipWithIndex.map { case (w, i) => lit(w) * col(s"z${i + 1}") }
          .reduceLeft(_ + _).as(s"e$j")
      }
      val e = z.select(col("doc_id") +: es: _*)
      val nrm = sqrt((0 until 4).map(j => col(s"e$j") * col(s"e$j")).reduceLeft(_ + _))
      e.select(col("doc_id") +: (0 until 4).map(j =>
          round(when(nrm === 0.0, 0.0).otherwise(col(s"e$j") / nrm), 6).as(s"v$j")): _*)
        .orderBy("doc_id")
    }
  )
}
