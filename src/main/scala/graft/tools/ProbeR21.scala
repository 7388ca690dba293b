package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Quantiles, Tables}

/** Round-21 interleaved A/B probe: OLD vs NEW formulations of the
  * quantile-family operators, alternated in ONE session so box drift
  * hits both sides equally (this box's controls drift 1.5-2× between
  * separate sbt invocations — see OPTIMIZATION_r21.md "Measurement
  * caveat"). Usage: runMain graft.tools.ProbeR21 [sfDir] [reps]
  *
  * The OLD formulations are frozen copies of the round-20 code; the
  * NEW side calls the live operators via SparkEntry, so this probe
  * keeps measuring the committed code as it evolves.
  */
object ProbeR21 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = { graft.engine.Session.pinLocale(); SparkSession.builder() }
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.execution.rangeExchange.sampleSizePerPartition", "20")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def li = Tables.lineitem(spark, sfDir)

    // ---- OLD q_agg_stats: three raw scans (two per-measure histograms
    // + sv), the round-20 shape.
    def oldStats(): DataFrame = {
      val medQty = Quantiles.histQuantilesOf(
          li, "l_returnflag", "l_quantity", Seq("med_qty" -> 0.5))
        .withColumnRenamed("g", "f")
      val p90Price = Quantiles.histQuantilesOf(
          li, "l_returnflag", "l_extendedprice", Seq("p90_price_raw" -> 0.9))
        .withColumnRenamed("g", "f")
      val quantiles = medQty.join(p90Price, "f")
      val sv = li.groupBy(col("l_returnflag").as("f")).agg(
        round(stddev_samp(col("l_discount")), 6).as("sd_disc"),
        round(var_samp(col("l_discount")), 6).as("var_disc"))
      sv.join(quantiles, "f")
        .select(col("f").as("l_returnflag"), col("sd_disc"), col("var_disc"),
          col("med_qty"), round(col("p90_price_raw"), 4).as("p90_price"))
        .orderBy("l_returnflag")
    }

    // ---- OLD q_agg_approx_quantile: histogram exact side + a SECOND
    // raw scan feeding percentile_approx (GK), the round-20 shape.
    def oldApproxQuantile(): DataFrame = {
      val exact = Quantiles.histQuantilesOf(
        li, "l_returnflag", "l_extendedprice",
        Seq("p50" -> 0.5, "p99" -> 0.99))
        .withColumnRenamed("g", "f")
      val sketch = li
        .groupBy(col("l_returnflag").as("f"))
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.99)), lit(1000)).as("aq"))
        .select(col("f"), col("aq")(0).as("a50"), col("aq")(1).as("a99"))
      exact.join(sketch, "f")
        .select(col("f").as("l_returnflag"), col("p50"), col("p99"),
          (abs(col("a50") - col("p50")) / col("p50") <= 0.05 &&
           abs(col("a99") - col("p99")) / col("p99") <= 0.05).as("sketch_ok"))
        .orderBy("l_returnflag")
    }

    // ---- OLD q_agg_kll_merge: cached histogram exact sides + a SECOND
    // raw scan feeding per-group Datasketches KLL, the round-20 shape
    // (cache elided: one suite run pays the cold path anyway, and the
    // uncached subtree is exchange-reused — like-for-like with NEW).
    def oldKllMerge(): DataFrame = {
      import graft.functions.SketchExprs
      val hist = li
        .groupBy(col("l_returnflag").as("g"),
          col("l_extendedprice").cast("double").as("v"))
        .agg(count(lit(1)).as("c"))
      val exact = Quantiles.histQuantiles(hist, Seq("p50" -> 0.5))
        .withColumnRenamed("g", "f")
      val globalExact = Quantiles.histQuantiles(
        hist.groupBy("v").agg(sum(col("c")).as("c"))
          .select(lit("ALL").as("g"), col("v"), col("c")),
        Seq("gp50" -> 0.5))
        .select("gp50")
      val merged = li
        .groupBy("l_returnflag")
        .agg(SketchExprs.kllSketchAgg(col("l_extendedprice")).as("sk"))
        .agg(SketchExprs.kllQuantile(SketchExprs.kllMergeAgg(col("sk")), 0.5).as("est"))
      val ok = merged.crossJoin(broadcast(globalExact))
        .select((abs(col("est") - col("gp50")) / col("gp50") <= 0.05).as("merged_ok"))
      exact.select(col("f").as("l_returnflag"), col("p50"))
        .crossJoin(broadcast(ok))
        .orderBy("l_returnflag")
    }

    def newQ(name: String)(): DataFrame = graft.SparkEntry.queries(name)(spark, sfDir)

    // ---- OLD semantic-dedup assignment: the round-20 crossJoin-explode
    // + max_by(id, struct(cos, -id)) groupBy formulation (frozen copies
    // of assignBrute/assignCoarse/refineCentroids/normedVectors before
    // the NearestCid kernel replaced the first two).
    import graft.ops.VectorOps
    def oldNormed(): DataFrame =
      Tables.embeddings(spark, sfDir).select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        .withColumn("nv", sqrt(VectorOps.dot(col("v"), col("v"))))
    def oldRefine(members: DataFrame): DataFrame =
      members
        .select(col("cid"), posexplode(col("v")).as(Seq("p", "x")))
        .groupBy("cid", "p")
        .agg(round(avg("x"), 6).as("m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("p"), col("m")))).as("dm"))
        .select(col("cid"), expr("transform(dm, y -> y.m)").as("c"))
    def oldAssignBrute(vn: DataFrame, cent: DataFrame): DataFrame = {
      val cc = cent.withColumn("nc", sqrt(VectorOps.dot(col("c"), col("c"))))
      vn.crossJoin(broadcast(cc))
        .withColumn("cos", VectorOps.dot(col("v"), col("c")) / (col("nv") * col("nc")))
        .groupBy("vec_id")
        .agg(max_by(col("cid"), struct(col("cos"), -col("cid"))).as("cid"),
             first(col("v")).as("v"), first(col("nv")).as("nv"))
    }
    def oldAssignCoarse(vn: DataFrame, cent: DataFrame, g: Int): DataFrame = {
      val grouped = cent.withColumn("gid", pmod(col("cid"), lit(g)))
      val supers = oldRefine(
          grouped.select(col("gid").as("cid"), col("c").as("v")))
        .select(col("cid").as("gid"), col("c").as("sc"))
        .withColumn("nsc", sqrt(VectorOps.dot(col("sc"), col("sc"))))
      val stage1 = vn.crossJoin(broadcast(supers))
        .withColumn("cos", VectorOps.dot(col("v"), col("sc")) / (col("nv") * col("nsc")))
        .groupBy("vec_id")
        .agg(max_by(col("gid"), struct(col("cos"), -col("gid"))).as("gid"),
             first(col("v")).as("v"), first(col("nv")).as("nv"))
      val cc = grouped.withColumn("nc", sqrt(VectorOps.dot(col("c"), col("c"))))
      stage1.join(broadcast(cc), Seq("gid"))
        .withColumn("cos", VectorOps.dot(col("v"), col("c")) / (col("nv") * col("nc")))
        .groupBy("vec_id")
        .agg(max_by(col("cid"), struct(col("cos"), -col("cid"))).as("cid"),
             first(col("v")).as("v"), first(col("nv")).as("nv"))
    }
    def oldSemantic(): DataFrame = {
      import graft.ops.Dedup.{semanticKFor, semanticGFor}
      val k = semanticKFor(VectorOps.corpusCount(Tables.embeddings(spark, sfDir)))
      val g = semanticGFor(k)
      val vn = oldNormed()
      def assign(cent: DataFrame) =
        if (g >= 1 && g < k) oldAssignCoarse(vn, cent, g) else oldAssignBrute(vn, cent)
      val c0 = vn.filter(col("vec_id") < k)
        .select(col("vec_id").as("cid"), col("v").as("c"))
      val m2 = assign(oldRefine(assign(c0)))
      val a = m2.select(col("cid"), col("vec_id").as("ida"), col("v").as("va"), col("nv").as("na"))
      val b = m2.select(col("cid"), col("vec_id").as("idb"), col("v").as("vb"), col("nv").as("nb"))
      a.join(b, Seq("cid"))
        .filter(col("ida") < col("idb") &&
          round(VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")), 6) >= 0.3)
        .select(col("idb").as("drop_id")).distinct()
        .orderBy("drop_id")
    }
    def oldSemanticAdmit(): DataFrame = {
      import graft.ops.Dedup.{semanticKFor, semanticGFor}
      val vn = oldNormed()
      val corpus = vn.filter(pmod(col("vec_id"), lit(10)) =!= 7)
      val batch = vn.filter(pmod(col("vec_id"), lit(10)) === 7)
      val k = semanticKFor(VectorOps.corpusCount(Tables.embeddings(spark, sfDir)))
      val g = semanticGFor(k)
      def assign(src: DataFrame, cent: DataFrame): DataFrame =
        if (g >= 1 && g < k) oldAssignCoarse(src, cent, g)
        else oldAssignBrute(src, cent)
      val c0 = corpus.orderBy("vec_id").limit(k)
        .select(col("vec_id").as("cid"), col("v").as("c"))
      val c1 = graft.ops.Caches.cached(oldRefine(assign(corpus, c0)))
      val mc = assign(corpus, c1)
        .select(col("cid"), col("vec_id").as("cvid"), col("v").as("cv"), col("nv").as("cn"))
      val mb = assign(batch, c1)
      val dup = mb.join(mc, Seq("cid"))
        .filter(round(VectorOps.dot(col("v"), col("cv")) / (col("nv") * col("cn")), 6) >= 0.3)
        .groupBy("vec_id").agg(min(col("cvid")).as("dup_of"))
      batch.select("vec_id").join(dup, Seq("vec_id"), "left")
        .select(col("vec_id"),
          when(col("dup_of").isNotNull, "dup_of_corpus").otherwise("admit").as("decision"),
          col("dup_of"))
        .orderBy("vec_id")
    }

    // ---- OLD signature hashes: the round-20 conv(substring(md5(x)))
    // hex round-trip spellings of simhash / minhash / winnow (frozen
    // before the Md5Prefix60/Md5Chunks byte kernels replaced them).
    import graft.ops.Dedup.{NumPerm, Bands, JaccardThreshold}
    def oldSimhash(): DataFrame = {
      val toks = Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
        .filter(col("tok") =!= "")
        .withColumn("h", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
      val packedSums = (0 until 15).map { j =>
        sum((0 until 4).map { k =>
          shiftleft(shiftright(col("h"), 4 * j + k).bitwiseAND(1), 16 * k)
        }.reduce(_ + _)).as(s"p$j")
      }
      val nTok = count(lit(1)).as("n_tok")
      val sig = toks.groupBy("doc_id").agg(packedSums.head, packedSums.tail :+ nTok: _*)
        .select(col("doc_id"),
          (0 until 60).map { i =>
            val (j, k) = (i / 4, i % 4)
            val ones = shiftright(col(s"p$j"), 16 * k).bitwiseAND(0xFFFFL)
            when(ones * 2 > col("n_tok"), lit(1L << i)).otherwise(0L)
          }.reduce(_ + _).as("simhash"))
        .cache()
      val chunked = sig.select(col("doc_id"), col("simhash"),
        explode(array(graft.ops.Dedup.simhashBlockKeys(col("simhash")): _*)).as("bkey"))
      chunked.as("x").join(chunked.as("y"),
          col("x.bkey") === col("y.bkey") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("long").as("hamming"))
        .filter(col("hamming") <= 3)
        .distinct()
        .orderBy("id_a", "id_b")
    }
    def oldMinhash(): DataFrame = {
      val sh = graft.ops.Dedup.shingleTable(spark, sfDir)
      def h(j: Int): Column =
        conv(substring(md5(concat(lit(s"${j / 4}:"), col("shingle"))),
          (j % 4) * 8 + 1, 8), 16, 10).cast("long")
      val sigCols = (0 until NumPerm).map(j => min(h(j)).as(s"s$j"))
      val sigs = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*).cache()
      val rowsPerBand = NumPerm / Bands
      def bandSide(idName: String) = (0 until Bands).map { b =>
        val ks = (0 until rowsPerBand).map(r => col(s"s${b * rowsPerBand + r}").as(s"k$r"))
        sigs.select(col("doc_id").as(idName) +: lit(b).as("band") +: ks: _*)
      }.reduce(_ unionAll _)
      val candidates = bandSide("id_a").join(bandSide("id_b"),
          Seq("band") ++ (0 until rowsPerBand).map(r => s"k$r"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .cache()
      graft.ops.Dedup.jaccardPairs(sh, graft.ops.Dedup.capFor(spark, sfDir), Some(candidates))
        .filter(col("jac") >= JaccardThreshold)
        .orderBy("id_a", "id_b")
    }
    def oldWinnow(): DataFrame = {
      val (kk, wn) = (3, 4)
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
        .repartitionByRange(col("doc_id"))
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= kk + wn - 1)
        .select(col("doc_id"), transform(
          sequence(lit(0), size(col("toks")) - kk),
          i => conv(substring(md5(concat_ws(" ",
            element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2),
            element_at(col("toks"), i + 3))),
            1, 15), 16, 10).cast("long")).as("gh"))
        .select(col("doc_id"), array_sort(array_distinct(transform(
          sequence(lit(0), size(col("gh")) - wn),
          j => least(
            element_at(col("gh"), j + 1),
            element_at(col("gh"), j + 2),
            element_at(col("gh"), j + 3),
            element_at(col("gh"), j + 4))))).as("fps"))
        .select(col("doc_id"),
          size(col("fps")).cast("long").as("n_fp"),
          md5(array_join(transform(col("fps"), x => x.cast("string")), ",")).as("fp_digest"))
        .sortWithinPartitions("doc_id")
    }

    // ---- OLD q_sim_ivf: the round-20 shape — separate min-id
    // aggregate broadcast-joined for the query vector, q carried as a
    // broadcast subtree into probe ranking AND candidate scoring, and
    // the centroid chain as posexplode → groupBy(cell,dim) →
    // collect_list (two exchanges + a 64× Generate). Assignment frame
    // cached once here like the live memoized one.
    lazy val oldIvfAssigned: DataFrame = {
      val e0 = Tables.embeddings(spark, sfDir)
      val dn = e0.agg(max(size(col("embedding"))), count(lit(1))).head()
      val bits = {
        val n = dn.getLong(1); val cells = math.max(1L, (n - 1) / 256)
        math.min(12, math.max(4, 64 - java.lang.Long.numberOfLeadingZeros(cells)))
      }
      e0.select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        .withColumn("cell", VectorOps.lshSignature(col("v"), dn.getInt(0), bits))
        .cache()
    }
    def oldIvf(): DataFrame = {
      val e = oldIvfAssigned
      val cent = e
        .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg((sum(col("x").cast("decimal(20,8)")).cast("double") / count(lit(1))).as("c"))
      val cv = cent.groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
          sc => sc.getField("c")).as("cv"))
      val minId = e.agg(min(col("vec_id")).as("min_id"))
      val q = e.join(broadcast(minId), col("vec_id") === col("min_id"))
        .select(col("v").as("qv"), col("min_id"))
      val probe = cv.crossJoin(broadcast(q))
        .select(col("cell"),
          round(graft.functions.CosineSim.cosine_sim(col("cv"), col("qv")), 6).as("cscore"))
        .orderBy(col("cscore").desc, col("cell"))
        .limit(4)
        .select("cell")
      e.join(broadcast(probe), "cell")
        .crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("min_id"))
        .select(col("vec_id"),
          round(graft.functions.CosineSim.cosine_sim(col("v"), col("qv")), 6).as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10)
    }

    // ---- OLD segment dedup family: the round-20 keyed⋈firsts SMJ on
    // the 8-token segment string + full-segment re-aggregation by doc.
    def oldSegs(src: DataFrame): (DataFrame, DataFrame) = {
      val toks = split(col("text"), " ")
      val nseg = greatest(lit(1), ceil(size(toks) / lit(8.0))).cast("int")
      val segs = src
        .select(col("doc_id"), toks.as("tk"),
          explode(sequence(lit(0), nseg - 1)).as("i"))
        .select(col("doc_id"), col("i").cast("long").as("seg_idx"),
          array_join(slice(col("tk"), col("i") * 8 + 1, lit(8)), " ").as("seg"))
      val keyed = segs.withColumn("k", col("doc_id") * lit(1000000L) + col("seg_idx"))
      (keyed, keyed.groupBy("seg").agg(min("k").as("fk")))
    }
    def oldSegmentDedup(): DataFrame = {
      val (keyed, firsts) = oldSegs(Tables.documents(spark, sfDir))
      keyed.join(firsts, Seq("seg"))
        .withColumn("keep", col("k") === col("fk"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_segs"),
          sum(when(col("keep"), 1).otherwise(0)).cast("long").as("n_kept"),
          array_join(transform(
            array_sort(collect_list(when(col("keep"), struct(col("seg_idx"), col("seg"))))),
            x => x.getField("seg")), " ").as("cleaned_text"))
        .orderBy("doc_id")
    }
    def oldPretrain(): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val toks = split(col("text"), " ")
      val gated = Tables.documents(spark, sfDir)
        .withColumn("nt", size(toks).cast("long"))
        .filter(col("nt").between(25, 80))
        .select("doc_id", "source", "text", "nt")
      val (keyed, firsts) = oldSegs(gated)
      val kept = keyed.join(firsts, Seq("seg"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_segs"),
          sum(when(col("k") === col("fk"), 1).otherwise(0)).as("n_kept"))
      val dd = gated.join(kept, Seq("doc_id"))
        .filter(col("n_kept").cast("double") / col("n_segs") >= 0.6)
        .select("doc_id", "source", "nt")
      val capped = dd
        .withColumn("rn", row_number().over(
          Window.partitionBy("source")
            .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
        .filter(col("rn") <= 8)
      val agg = capped.groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
        .withColumn("w", sqrt(col("n_tokens").cast("double")).cast("decimal(18,6)"))
      val total = agg.agg(sum(col("w")).as("tw"))
      agg.crossJoin(broadcast(total))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("w").cast("double") / col("tw").cast("double"), 6).as("mix_weight"))
        .orderBy("source")
    }

    val pairs: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("q_sim_ivf", () => oldIvf(), newQ("q_sim_ivf") _),
      ("q_pipeline_pretrain", () => oldPretrain(), newQ("q_pipeline_pretrain") _),
      ("q_text_segment_dedup", () => oldSegmentDedup(), newQ("q_text_segment_dedup") _),
      ("q_agg_stats", () => oldStats(), newQ("q_agg_stats") _),
      ("q_agg_approx_quantile", () => oldApproxQuantile(), newQ("q_agg_approx_quantile") _),
      ("q_agg_kll_merge", () => oldKllMerge(), newQ("q_agg_kll_merge") _),
      ("q_dedup_semantic", () => oldSemantic(), newQ("q_dedup_semantic") _),
      ("q_dedup_semantic_admit", () => oldSemanticAdmit(), newQ("q_dedup_semantic_admit") _),
      ("q_dedup_simhash", () => oldSimhash(), newQ("q_dedup_simhash") _),
      ("q_dedup_minhash", () => oldMinhash(), newQ("q_dedup_minhash") _),
      ("q_text_winnow", () => oldWinnow(), newQ("q_text_winnow") _))

    val only = sys.env.get("PROBE_ONLY").map(_.split(",").toSet)
    val run = only.fold(pairs)(f => pairs.filter(p => f(p._1)))

    def time(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    run.foreach { case (name, oldF, newF) =>
      // warm both once (codegen/JIT), then alternate old/new
      time(oldF()); time(newF()); graft.ops.Caches.release()
      val olds = scala.collection.mutable.ArrayBuffer.empty[Double]
      val news = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ =>
        olds += time(oldF()); graft.ops.Caches.release()
        news += time(newF()); graft.ops.Caches.release()
      }
      def fmt(xs: Seq[Double]) =
        f"min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f " +
          xs.map(x => f"$x%.2f").mkString("[", ",", "]")
      println(f"$name%-24s OLD ${fmt(olds.toSeq)}")
      println(f"$name%-24s NEW ${fmt(news.toSeq)}")
    }
    spark.stop()
  }
}
