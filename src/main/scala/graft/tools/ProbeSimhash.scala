package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-21 stage-split probe for q_dedup_simhash: where do the sf10
  * seconds go — token hash, signature aggregate, or the block-key
  * join? Usage: runMain graft.tools.ProbeSimhash [sfDir] [reps]
  */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val spark = { graft.engine.Session.pinLocale(); SparkSession.builder() }
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.HashFns

    def toks = graft.ops.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      .filter(col("tok") =!= "")
    def hashed = toks.withColumn("h", HashFns.md5_prefix60(col("tok")))
    def sig = {
      val packedSums = (0 until 15).map { j =>
        sum((0 until 4).map { k =>
          shiftleft(shiftright(col("h"), 4 * j + k).bitwiseAND(1), 16 * k)
        }.reduce(_ + _)).as(s"p$j")
      }
      val nTok = count(lit(1)).as("n_tok")
      hashed.groupBy("doc_id").agg(packedSums.head, packedSums.tail :+ nTok: _*)
        .select(col("doc_id"),
          (0 until 60).map { i =>
            val (j, k) = (i / 4, i % 4)
            val ones = shiftright(col(s"p$j"), 16 * k).bitwiseAND(0xFFFFL)
            when(ones * 2 > col("n_tok"), lit(1L << i)).otherwise(0L)
          }.reduce(_ + _).as("simhash"))
    }
    def joined = {
      val sg = sig.cache()
      val chunked = sg.select(col("doc_id"), col("simhash"),
        explode(array(graft.ops.Dedup.simhashBlockKeys(col("simhash")): _*)).as("bkey"))
      val out = chunked.as("x").join(chunked.as("y"),
          col("x.bkey") === col("y.bkey") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
        .filter(col("hamming") <= 3)
        .distinct()
        .orderBy("id_a", "id_b")
      (sg, out)
    }

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // round-21 signature-level variants (sig warm-cached per call)
    def sigLevel(finish: DataFrame => DataFrame): Double = {
      val sg = sig.cache()
      val ds = sg.select("simhash").distinct()
      val chunked = ds.select(col("simhash"),
        explode(array(graft.ops.Dedup.simhashBlockKeys(col("simhash")): _*)).as("bkey"))
      val sigPairs = chunked.as("x").join(chunked.as("y"),
          col("x.bkey") === col("y.bkey") && col("x.simhash") < col("y.simhash"))
        .select(col("x.simhash").as("sa"), col("y.simhash").as("sb"),
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
        .filter(col("hamming") <= 3)
        .distinct()
      val cross = sigPairs
        .join(sg.select(col("simhash").as("sa"), col("doc_id").as("da")), "sa")
        .join(sg.select(col("simhash").as("sb"), col("doc_id").as("db")), "sb")
        .select(least(col("da"), col("db")).as("id_a"),
          greatest(col("da"), col("db")).as("id_b"), col("hamming"))
      val same = sg.as("x").join(sg.as("y"),
          col("x.simhash") === col("y.simhash") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
          lit(0L).as("hamming"))
      val t = time(finish(cross.unionAll(same)))
      sg.unpersist()
      t
    }
    val stages: Seq[(String, () => Double)] = Seq(
      "tokens" -> (() => time(toks)),
      "hashed" -> (() => time(hashed)),
      "sig_agg" -> (() => time(sig)),
      "full" -> (() => { val (sg, out) = joined; val t = time(out); sg.unpersist(); t }),
      "join_only(warm sig)" -> (() => {
        val (sg, out) = joined
        sg.count() // materialize cache untimed
        val t = time(out)
        sg.unpersist()
        t
      }),
      "sigLvl_noSort" -> (() => sigLevel(identity)),
      "sigLvl_sort" -> (() => sigLevel(_.orderBy("id_a", "id_b"))),
      "sigLvl_repart_sort" -> (() => sigLevel(
        _.repartition(col("id_a")).orderBy("id_a", "id_b"))))
    stages.foreach { case (_, f) => f() } // warm JIT
    stages.foreach { case (n, f) =>
      val xs = (1 to reps).map(_ => f())
      println(f"$n%-22s min=${xs.min}%.3f ${xs.map(x => f"$x%.2f").mkString("[", ",", "]")}")
    }
    spark.stop()
  }
}
