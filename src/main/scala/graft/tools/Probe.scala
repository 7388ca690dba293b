package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Tables._

/** Dev-only micro-probe: isolates where bench time goes (decimal agg vs
  * double agg, scan cost, shuffle width). Not part of the driver contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = { graft.engine.Session.pinLocale(); SparkSession.builder() }
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val li = lineitem(spark, sfDir)
    time("warm scan count")(li.count())
    time("scan count again")(li.count())

    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    time("q1 double sums") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")), sum(disc),
          avg(col("l_quantity")), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("q1 decimal sums") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")), dsum(col("l_extendedprice")), dsum6(disc),
          (dsum(col("l_quantity")) / count(lit(1))), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("q1 decimal full (as in q_agg_group)") {
      graft.SparkEntry.queries("q_agg_group")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("count distinct x2") {
      li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")), countDistinct(col("l_orderkey")))
        .write.format("noop").mode("overwrite").save()
    }
    import graft.ops.Dedup
    val docs = documents(spark, sfDir)
    time("shingleTable count") {
      println("  rows=" + Dedup.shingleTable(docs).count())
    }
    time("shingleTable count again") {
      println("  rows=" + Dedup.shingleTable(docs).count())
    }
    val sh = Dedup.shingleTable(docs)
    time("df-prune + pair join count") {
      val pruned = sh.join(
        sh.groupBy("shingle").agg(count(lit(1)).as("df")).filter(col("df") <= 50)
          .select("shingle"), Seq("shingle"), "left_semi")
      val a = pruned.select(col("doc_id").as("id_a"), col("shingle"))
      val b = pruned.select(col("doc_id").as("id_b"), col("shingle"))
      println("  pairs=" + a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b")).count())
    }
    time("ngram_jaccard full") {
      graft.SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    time("minhash") {
      graft.SparkEntry.queries("q_dedup_minhash")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    // minhash component breakdown (mirrors the query internals)
    locally {
      val sh2 = Dedup.shingleTable(docs)
      def h(j: Int) =
        conv(substring(md5(concat(lit(s"${j / 4}:"), col("shingle"))),
          (j % 4) * 8 + 1, 8), 16, 10).cast("long")
      val sigCols = (0 until 16).map(j => min(h(j)).as(s"s$j"))
      val sigs = sh2.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*).cache()
      time("  mh sigs materialize")(sigs.count())
      def bandSide(idName: String) = (0 until 4).map { b =>
        val ks = (0 until 4).map(r => col(s"s${b * 4 + r}").as(s"k$r"))
        sigs.select(col("doc_id").as(idName) +: lit(b).as("band") +: ks: _*)
      }.reduce(_ unionAll _)
      val cand = bandSide("id_a").join(bandSide("id_b"),
          Seq("band") ++ (0 until 4).map(r => s"k$r"))
        .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct().cache()
      time("  mh candidates")(println("  cand=" + cand.count()))
      time("  mh verify") {
        Dedup.jaccardPairs(sh2, 50, Some(cand))
          .filter(col("jac") >= 0.5).orderBy("id_a", "id_b")
          .write.format("noop").mode("overwrite").save()
      }
    }

    // project-before-sort vs sort-before-project for derived columns
    import org.apache.spark.sql.types.DecimalType
    def derived(df: org.apache.spark.sql.DataFrame) = df.select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_linenumber").cast("string").as("ln_str"),
      col("l_quantity").cast("long").cast("string").as("qty_str"),
      col("l_quantity").cast(DecimalType(10, 2)).cast("string").as("qty_dec_str"),
      date_format(to_date(date_format(col("l_shipdate"), "yyyy-MM-dd")), "yyyy-MM-dd").as("ship_day"))
    time("project then sort") {
      derived(li).orderBy("l_orderkey", "l_linenumber")
        .write.format("noop").mode("overwrite").save()
    }
    time("sort then project") {
      derived(li.select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
