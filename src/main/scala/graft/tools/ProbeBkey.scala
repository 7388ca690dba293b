package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-21: q_dedup_simhash block-key distribution — is the candidate
  * join quadratic on hot keys? Usage: runMain graft.tools.ProbeBkey [sfDir]
  */
object ProbeBkey {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = { graft.engine.Session.pinLocale(); SparkSession.builder() }
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.HashFns
    val toks = graft.ops.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("h", HashFns.md5_prefix60(col("tok")))
    val packedSums = (0 until 15).map { j =>
      sum((0 until 4).map { k =>
        shiftleft(shiftright(col("h"), 4 * j + k).bitwiseAND(1), 16 * k)
      }.reduce(_ + _)).as(s"p$j")
    }
    val sig = toks.groupBy("doc_id").agg(packedSums.head, packedSums.tail :+ count(lit(1)).as("n_tok"): _*)
      .select(col("doc_id"),
        (0 until 60).map { i =>
          val (j, k) = (i / 4, i % 4)
          val ones = shiftright(col(s"p$j"), 16 * k).bitwiseAND(0xFFFFL)
          when(ones * 2 > col("n_tok"), lit(1L << i)).otherwise(0L)
        }.reduce(_ + _).as("simhash")).cache()
    val chunked = sig.select(col("doc_id"),
      explode(array(graft.ops.Dedup.simhashBlockKeys(col("simhash")): _*)).as("bkey"))
    val grp = chunked.groupBy("bkey").agg(count(lit(1)).as("n")).cache()
    val top = grp.orderBy(col("n").desc).limit(20).collect()
    println("top bkey sizes: " + top.map(_.getLong(1)).mkString(","))
    val pairStats = grp.agg(sum(col("n") * (col("n") - 1) / 2).as("pairs"),
      count(lit(1)).as("n_keys"), sum(col("n")).as("rows")).head()
    println(s"candidate pairs=${pairStats.get(0)} keys=${pairStats.getLong(1)} rows=${pairStats.getLong(2)}")
    val nd = sig.count()
    println(s"docs=$nd")
    val sg = sig.groupBy("simhash").agg(count(lit(1)).as("m")).cache()
    val st = sg.agg(count(lit(1)).as("n_sigs"), max(col("m")).as("max_group"),
      sum(col("m") * (col("m") - 1) / 2).as("same_sig_pairs")).head()
    println(s"distinct_sigs=${st.getLong(0)} max_group=${st.getLong(1)} same_sig_pairs=${st.get(2)}")
    // sig-level candidate pairs through the same 20-key blocking
    val dsk = sg.select(col("simhash"),
      explode(array(graft.ops.Dedup.simhashBlockKeys(col("simhash")): _*)).as("bkey"))
    val sigCand = dsk.groupBy("bkey").agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * (col("n") - 1) / 2)).head()
    println(s"sig_level_candidate_pairs=${sigCand.get(0)}")
    spark.stop()
  }
}
