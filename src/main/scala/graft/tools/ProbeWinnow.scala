package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe (round 19): where do q_text_winnow's 37.7 s at sf10
  * go? The query is zero-shuffle higher-order-function work (trigram
  * md5 hashes → windowed mins → distinct → sort → digest), so the cost
  * is per-stage expression evaluation: this isolates each stage and
  * measures whether `fps` being referenced twice in the final select
  * (size + digest) evaluates the whole chain twice (lambda expressions
  * don't enter whole-stage codegen, so projection-level CSE is not a
  * given). */
object ProbeWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = { graft.engine.Session.pinLocale(); SparkSession.builder() }
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-44s min=${ts.min}%.3f s (3 reps)")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val K = 3; val Wn = 4
    val docs = graft.ops.Tables.documents(spark, sfDir)
    docs.count()
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= K + Wn - 1)
    def ghCol = transform(
      sequence(lit(0), size(col("toks")) - K),
      i => conv(substring(md5(array_join(slice(col("toks"), i + 1, lit(K)), " ")),
        1, 15), 16, 10).cast("long")).as("gh")
    def minsCol = transform(
      sequence(lit(0), size(col("gh")) - Wn),
      j => array_min(slice(col("gh"), j + 1, lit(Wn)))).as("mins")

    time("1 gh only (trigram md5)") {
      noop(toks.select(col("doc_id"), ghCol).select(col("doc_id"), size(col("gh"))))
    }
    time("2 + windowed mins") {
      noop(toks.select(col("doc_id"), ghCol).select(col("doc_id"), minsCol)
        .select(col("doc_id"), size(col("mins"))))
    }
    time("3 + distinct") {
      noop(toks.select(col("doc_id"), ghCol).select(col("doc_id"), minsCol)
        .select(col("doc_id"), array_distinct(col("mins")).as("fps"))
        .select(col("doc_id"), size(col("fps"))))
    }
    time("4 + sort (single ref)") {
      noop(toks.select(col("doc_id"), ghCol).select(col("doc_id"), minsCol)
        .select(col("doc_id"), array_sort(array_distinct(col("mins"))).as("fps"))
        .select(col("doc_id"), size(col("fps"))))
    }
    time("5 digest only (single ref)") {
      noop(toks.select(col("doc_id"), ghCol).select(col("doc_id"), minsCol)
        .select(col("doc_id"), array_sort(array_distinct(col("mins"))).as("fps"))
        .select(col("doc_id"),
          md5(array_join(transform(col("fps"), x => x.cast("string")), ","))))
    }
    time("6 BOTH outputs (the query's shape)") {
      noop(toks.select(col("doc_id"), ghCol).select(col("doc_id"), minsCol)
        .select(col("doc_id"), array_sort(array_distinct(col("mins"))).as("fps"))
        .select(col("doc_id"), size(col("fps")).cast("long").as("n_fp"),
          md5(array_join(transform(col("fps"), x => x.cast("string")), ","))
            .as("fp_digest")))
    }
    spark.stop()
  }
}
