package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Multimodal, Tables}

/** The multimodal plumbing contract: stubbed decode/feature ops are
  * deterministic, schema-stable, and partition-parallel (pure column
  * expressions — no driver round-trips). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** A w×h PNG: left half dark (rgb 16), right half bright (rgb 240). */
  private def halfPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = if (x < w / 2) 16 else 240
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("REAL image decode: format/dimensions from actual PNG and BMP bytes") {
    import spark.implicits._
    val png = halfPng(64, 48)
    val bmp = {
      val img = new java.awt.image.BufferedImage(10, 20,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", bos)
      bos.toByteArray
    }
    val df = Seq((1L, png), (2L, bmp), (3L, "not an image".getBytes))
      .toDF("id", "payload")
      .withColumn("meta", Multimodal.decodeImage(col("payload")))
      .select(col("id"), col("meta.format"), col("meta.width"), col("meta.height"))
      .orderBy("id").collect()
    assert(df(0).getString(1) == "png" && df(0).getInt(2) == 64 && df(0).getInt(3) == 48)
    assert(df(1).getString(1) == "bmp" && df(1).getInt(2) == 10 && df(1).getInt(3) == 20)
    assert(df(2).isNullAt(1)) // undecodable → null meta
  }

  test("REAL image features: 4x4 grayscale reflects pixel content") {
    import spark.implicits._
    val feats = Seq(Tuple1(halfPng(64, 64))).toDF("payload")
      .select(Multimodal.imageFeatures(col("payload")).as("f"))
      .head.getSeq[Double](0)
    assert(feats.length == 16)
    // columns 0-1 sample the dark half, 2-3 the bright half
    val dark = Seq(0, 1, 4, 5, 8, 9, 12, 13).map(feats)
    val bright = Seq(2, 3, 6, 7, 10, 11, 14, 15).map(feats)
    assert(dark.forall(_ < 0.2) && bright.forall(_ > 0.8), s"$feats")
  }

  test("REAL resize: aspect-preserving box fit, re-decodable output") {
    import spark.implicits._
    val resized = Seq(Tuple1(halfPng(100, 50))).toDF("payload")
      .select(Multimodal.resizeImage(col("payload"), lit(32), lit(32)).as("r"))
      .head.getAs[Array[Byte]](0)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(resized))
    assert(back.getWidth == 32 && back.getHeight == 16) // aspect kept
  }

  /** 16-bit mono WAV: first half 440 Hz sine at full scale, second half
    * silence. */
  private def sineWav(sampleRate: Int = 8000, nFrames: Int = 8000): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames / 2) {
      val v = (math.sin(2 * math.Pi * 440 * i / sampleRate) * 32000).toInt
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("REAL audio decode: WAV header fields; undecodable bytes are null") {
    import spark.implicits._
    val rows = Seq((1L, sineWav()), (2L, "noise".getBytes)).toDF("id", "payload")
      .withColumn("meta", Multimodal.decodeAudio(col("payload")))
      .select(col("id"), col("meta.format"), col("meta.sample_rate"),
        col("meta.channels"), col("meta.n_frames"))
      .orderBy("id").collect()
    assert(rows(0).getString(1) == "wave" && rows(0).getInt(2) == 8000)
    assert(rows(0).getInt(3) == 1 && rows(0).getLong(4) == 8000L)
    assert(rows(1).isNullAt(1))
  }

  test("REAL audio features: RMS energy contrasts tone vs silence") {
    import spark.implicits._
    val f = Seq(Tuple1(sineWav())).toDF("payload")
      .select(Multimodal.audioFeatures(col("payload")).as("f"))
      .head.getSeq[Double](0)
    assert(f.length == 16)
    val tone = f.take(8)
    val silence = f.drop(8)
    assert(tone.forall(_ > 0.5), s"tone energy: $tone")
    assert(silence.forall(_ < 0.01), s"silence energy: $silence")
  }

  /** Assemble a real MJPEG-in-AVI: RIFF header, hdrl list with the avih
    * main header, movi list with one '00dc' JPEG chunk per frame. */
  private def mjpegAvi(frames: Seq[Array[Byte]], w: Int, h: Int,
      usPerFrame: Int): Array[Byte] = {
    def le(v: Long): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("ISO-8859-1") ++ le(data.length) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(typ: String, data: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("ISO-8859-1") ++ data)
    // MainAVIHeader: 14 u32le fields (56 bytes)
    val avih = Seq[Long](usPerFrame, 0, 0, 0, frames.length, 0, 1, 0, w, h,
      0, 0, 0, 0).flatMap(le).toArray
    val body = list("hdrl", chunk("avih", avih)) ++
      list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    "RIFF".getBytes("ISO-8859-1") ++ le(body.length + 4) ++
      "AVI ".getBytes("ISO-8859-1") ++ body
  }

  /** A w×h JPEG of uniform gray level v (0..255). */
  private def grayJpeg(w: Int, h: Int, v: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (v << 16) | (v << 8) | v)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("REAL video decode: AVI header fields; undecodable bytes are null") {
    import spark.implicits._
    val avi = mjpegAvi(Seq(grayJpeg(32, 24, 0), grayJpeg(32, 24, 128),
      grayJpeg(32, 24, 250)), 32, 24, 40000)
    val rows = Seq((1L, avi), (2L, "not a video".getBytes)).toDF("id", "payload")
      .withColumn("meta", Multimodal.decodeVideo(col("payload")))
      .select(col("id"), col("meta.format"), col("meta.width"),
        col("meta.height"), col("meta.n_frames"), col("meta.us_per_frame"))
      .orderBy("id").collect()
    assert(rows(0).getString(1) == "avi" && rows(0).getInt(2) == 32 &&
      rows(0).getInt(3) == 24 && rows(0).getLong(4) == 3L &&
      rows(0).getLong(5) == 40000L)
    assert(rows(1).isNullAt(1))
  }

  test("REAL frame sampling: stride-2 picks frames 0 and 2, bytes re-decode") {
    import spark.implicits._
    val f0 = grayJpeg(32, 24, 10); val f1 = grayJpeg(32, 24, 120)
    val f2 = grayJpeg(32, 24, 240)
    val avi = mjpegAvi(Seq(f0, f1, f2), 32, 24, 40000)
    val sampled = Seq(Tuple1(avi)).toDF("payload")
      .select(Multimodal.sampleFrames(col("payload"), lit(2)).as("fr"))
      .head.getSeq[Array[Byte]](0)
    assert(sampled.length == 2)
    assert(sampled(0).sameElements(f0) && sampled(1).sameElements(f2))
    // each sampled frame is a standalone JPEG ImageIO can decode
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(sampled(1)))
    assert(back.getWidth == 32 && back.getHeight == 24)
  }

  test("REAL video features: per-frame mean gray tracks frame content") {
    import spark.implicits._
    val avi = mjpegAvi(Seq(grayJpeg(32, 24, 10), grayJpeg(32, 24, 240)),
      32, 24, 40000)
    val feats = Seq(Tuple1(avi)).toDF("payload")
      .select(Multimodal.videoFeatures(col("payload"), lit(1)).as("f"))
      .head.getSeq[Double](0)
    assert(feats.length == 2)
    assert(feats(0) < 0.2 && feats(1) > 0.8, s"$feats")
  }

  test("fakeDecode emits the MediaMetaSchema contract deterministically") {
    val media = Multimodal.mediaTable(spark, TestSpark.Sf)
      .withColumn("meta", Multimodal.fakeDecode(col("payload")))
    import org.apache.spark.sql.types.StructType
    val metaType = media.schema("meta").dataType.asInstanceOf[StructType]
    assert(metaType.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.MediaMetaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val r1 = media.select("doc_id", "meta").collect().map(_.toString).sorted
    val r2 = media.select("doc_id", "meta").collect().map(_.toString).sorted
    assert(r1.sameElements(r2))
    val m = media.select(col("meta.width"), col("meta.height"), col("meta.format")).collect()
    assert(m.forall(r => r.getInt(0) >= 1 && r.getInt(0) <= 1024))
    assert(m.forall(r => Set("jpeg", "png", "wav").contains(r.getString(2))))
  }

  test("fakeFeatures yields fixed-dim bounded vectors") {
    val f = Multimodal.mediaTable(spark, TestSpark.Sf)
      .select(Multimodal.fakeFeatures(col("payload")).as("f"))
      .collect().map(_.getSeq[Double](0))
    assert(f.forall(_.length == 16))
    assert(f.forall(_.forall(x => x >= -1.0 && x <= 1.0)))
  }

  test("fakeResize truncates payloads to the byte budget") {
    val n = Multimodal.mediaTable(spark, TestSpark.Sf)
      .select(octet_length(Multimodal.fakeResize(col("payload"), 64)).as("n"))
      .collect().map(_.getInt(0))
    assert(n.forall(_ <= 64))
  }

  test("frame sampler emits 256-byte frames") {
    val frames = Multimodal.mediaTable(spark, TestSpark.Sf)
      .filter(octet_length(col("payload")) >= lit(256))
      .select(Multimodal.fakeFrameSample(col("payload"), 1).as("fr"))
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getSeq[Array[Byte]](0).forall(_.length <= 256)))
  }

  // ---------------- learned encoder ----------------

  test("LEARNED encoder: fit learns the corpus standardization (z mean~0, std~1)") {
    val docs = Tables.documents(spark, TestSpark.Sf)
    val m = Multimodal.fitEncoder(docs, col("text"))
    assert(m.nDocs == docs.count())
    assert(m.std.forall(_ > 0.0), s"degenerate feature in ${m.std.toSeq}")
    // standardizing with the learned weights must give mean~0 / std~1 per
    // feature — the defining property of a correctly-fit encoder
    val zdf = docs.select(
      ((length(col("text")).cast("double") - lit(m.mean(0))) / lit(m.std(0))).as("z"))
    val r = zdf.agg(avg(col("z")), stddev_samp(col("z"))).head()
    assert(math.abs(r.getDouble(0)) < 1e-9, s"z mean ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-9, s"z std ${r.getDouble(1)}")
  }

  test("LEARNED encoder: model API is bit-identical to the oracled in-plan query") {
    val docs = Tables.documents(spark, TestSpark.Sf)
    val m = Multimodal.fitEncoder(docs, col("text"))
    val api = docs
      .select(col("doc_id"), Multimodal.encodeColumn(m, col("text")).as("v"))
      .select(col("doc_id"), col("v")(0).as("v0"), col("v")(1).as("v1"),
        col("v")(2).as("v2"), col("v")(3).as("v3"))
      .orderBy("doc_id").collect()
    val query = graft.SparkEntry.queries("q_media_learned_encoder")(spark, TestSpark.Sf)
      .collect()
    assert(api.length == query.length && api.length > 0)
    api.zip(query).foreach { case (a, q) =>
      assert(a.getLong(0) == q.getLong(0))
      (1 to 4).foreach(i => assert(a.getDouble(i) == q.getDouble(i),
        s"doc ${a.getLong(0)} dim $i: api ${a.getDouble(i)} vs query ${q.getDouble(i)}"))
    }
  }

  test("LEARNED encoder: embeddings are unit-norm, 4-dim, deterministic") {
    val docs = Tables.documents(spark, TestSpark.Sf)
    val m = Multimodal.fitEncoder(docs, col("text"))
    val enc = docs.select(col("doc_id"), Multimodal.encodeColumn(m, col("text")).as("v"))
    val vs = enc.orderBy("doc_id").collect().map(_.getSeq[Double](1))
    assert(vs.forall(_.length == 4))
    // rounding to 6 dp perturbs the norm by at most ~2e-6 per dim
    assert(vs.forall(v => math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-5))
    val again = enc.orderBy("doc_id").collect().map(_.getSeq[Double](1))
    assert(vs.zip(again).forall { case (a, b) => a == b })
    // embeddings discriminate: not all docs collapse to one vector
    assert(vs.distinct.length > 1)
  }

  test("LEARNED encoder: degenerate (zero-variance) feature yields 0, never NaN") {
    import spark.implicits._
    // constant-length digit-free texts make c_len/c_lower/c_vowel collapse
    // in various combinations; the guard must zero those dims out
    val df = Seq((1L, "aaaa bb"), (2L, "cccc dd"), (3L, "eeee ff"))
      .toDF("doc_id", "text")
    val m = Multimodal.fitEncoder(df, col("text"))
    assert(m.std(0) == 0.0) // all length 7 — degenerate by construction
    val vs = df.select(Multimodal.encodeColumn(m, col("text")).as("v"))
      .collect().map(_.getSeq[Double](0))
    assert(vs.forall(_.forall(x => !x.isNaN && !x.isInfinite)))
    // single-doc corpus: sample variance is 0/0 — every std must come
    // back 0 (not NaN) and the encoding must be the zero vector
    val one = Seq((1L, "just one document")).toDF("doc_id", "text")
    val m1 = Multimodal.fitEncoder(one, col("text"))
    assert(m1.std.forall(_ == 0.0), s"n=1 std must be 0, got ${m1.std.toSeq}")
    val v1 = one.select(Multimodal.encodeColumn(m1, col("text")).as("v"))
      .head().getSeq[Double](0)
    assert(v1.forall(_ == 0.0), s"n=1 encoding must be the zero vector, got $v1")
  }
}
