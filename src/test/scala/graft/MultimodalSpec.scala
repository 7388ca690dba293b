package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Multimodal, Tables}

/** The multimodal plumbing contract: stubbed decode/feature ops are
  * deterministic, schema-stable, and partition-parallel (pure column
  * expressions — no driver round-trips). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

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
}
