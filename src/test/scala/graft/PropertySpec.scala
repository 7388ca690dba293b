package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._

import graft.engine.Results

/** Property-based checks (SURVEY.md §5.2-4): the markdown formatter is
  * total under arbitrary cell values; top-k ≡ sort-then-take; dedup is
  * idempotent; the as-of join equals its naive per-row definition;
  * salting never changes join results. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic ScalaCheck sampling (no scalatestplus bridge in the
    * offline cache): N draws from fixed seeds. */
  private def samples[T](g: Gen[T], n: Int = 30): Seq[T] = {
    val params = Gen.Parameters.default
    (1 to n).flatMap(i => g.apply(params, org.scalacheck.rng.Seed(i.toLong)))
  }
  private def forAll[T](g: Gen[T], n: Int = 30)(f: T => Unit): Unit =
    samples(g, n).foreach(f)

  test("markdown formatter is total and respects the display rules") {
    val cell: Gen[Any] = Gen.oneOf(
      Gen.const(null),
      Gen.double.map(d => d: Any),
      Gen.long.map(l => l: Any),
      Gen.chooseNum(-1000000, 1000000).map(i => i: Any),
      Gen.asciiPrintableStr.map(s => s: Any),
      Gen.listOf(Gen.alphaChar).map(_.mkString * 3).map(s => s: Any))
    forAll(cell) { v =>
      val out = Results.formatCell(v)
      assert(out != null)
      v match {
        case null => assert(out == "null")
        case s: String if s.length > Results.StringCap =>
          assert(out.length == Results.StringCap + 3 && out.endsWith("..."))
        case d: Double if !d.isNaN && !d.isInfinite =>
          assert(out.matches("-?[0-9,]*\\.[0-9]{2}"))
        case _ => ()
      }
    }
  }

  test("top-k (orderBy+limit) ≡ sort-then-take") {
    forAll(Gen.zip(Gen.listOfN(60, Gen.chooseNum(-1000, 1000)), Gen.chooseNum(1, 20)), 10) {
      case (xs: List[Int], k: Int) =>
        val df = xs.zipWithIndex.toDF("x", "id")
        val topk = df.orderBy(col("x").desc, col("id")).limit(k)
          .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
        val naive = xs.zipWithIndex.sortBy { case (x, id) => (-x, id) }.take(k)
        assert(topk == naive)
    }
  }

  test("exact dedup is idempotent and keeps one row per key") {
    forAll(Gen.listOfN(50, Gen.chooseNum(0, 9)), 10) { keys: List[Int] =>
      if (keys.nonEmpty) {
        val df = keys.zipWithIndex.toDF("k", "id")
        val once = df.groupBy("k").agg(min("id").as("keep"))
        assert(once.count() == keys.distinct.size)
        val twice = once.groupBy("k").agg(min("keep").as("keep"))
        assert(twice.collect().map(_.toString).sorted.toSeq ==
          once.collect().map(_.toString).sorted.toSeq)
      }
    }
  }

  test("as-of join equals the naive per-row definition") {
    val gen = for {
      lefts  <- Gen.listOfN(25, Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0L, 1000L)))
      rights <- Gen.listOfN(15, Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0L, 1000L)))
    } yield (lefts, rights)
    forAll(gen, 10) { case (lefts, rights) =>
      val l = lefts.zipWithIndex.map { case ((k, t), i) =>
        (i.toLong, k.toLong, new java.sql.Timestamp(t * 1000000L)) }
        .toDF("lid", "k", "lt")
      val r = rights.map { case (k, t) =>
        (k.toLong, new java.sql.Timestamp(t * 1000000L)) }.toDF("rk", "rt")
      val got = ops.AsOf.asofJoin(l, r, "k", "rk", "lt", "rt", "rt", "matched")
        .collect().map(row => row.getAs[Long]("lid") ->
          Option(row.getAs[java.sql.Timestamp]("matched"))).toMap
      lefts.zipWithIndex.foreach { case ((k, t), i) =>
        val expect = rights.filter { case (rk, rt) => rk == k && rt <= t }
          .map(_._2).sorted.lastOption
          .map(ts => new java.sql.Timestamp(ts * 1000000L))
        assert(got(i.toLong) == expect,
          s"left $i (k=$k, t=$t): got ${got(i.toLong)}, want $expect")
      }
    }
  }

  test("multi-payload as-of join carries all payloads from ONE matched row") {
    val gen = for {
      lefts  <- Gen.listOfN(20, Gen.zip(Gen.chooseNum(0, 2), Gen.chooseNum(0L, 500L)))
      rights <- Gen.listOfN(12, Gen.zip(Gen.chooseNum(0, 2), Gen.chooseNum(0L, 500L)))
    } yield (lefts, rights)
    forAll(gen, 8) { case (lefts, rights) =>
      // unique right (key, time) so the match is well-defined; payloads
      // (v1, v2) are derived from (key, time) so same-row carry is checkable
      val rUniq = rights.distinct
      val l = lefts.zipWithIndex.map { case ((k, t), i) =>
        (i.toLong, k.toLong, new java.sql.Timestamp(t * 1000000L)) }
        .toDF("lid", "k", "lt")
      val r = rUniq.map { case (k, t) =>
        (k.toLong, new java.sql.Timestamp(t * 1000000L), t * 10 + k, s"p${k}_$t") }
        .toDF("rk", "rt", "v1", "v2")
      val got = ops.AsOf.asofJoinCols(l, r, "k", "rk", "lt", "rt",
        Seq("v1" -> "o1", "v2" -> "o2", "rt" -> "ot"))
        .collect().map(row => row.getAs[Long]("lid") ->
          (Option(row.getAs[java.lang.Long]("o1")),
           Option(row.getAs[String]("o2")))).toMap
      lefts.zipWithIndex.foreach { case ((k, t), i) =>
        val m = rUniq.filter { case (rk, rt) => rk == k && rt <= t }
          .sortBy(_._2).lastOption
        val expect = (m.map(x => Long.box(x._2 * 10 + x._1)),
          m.map(x => s"p${x._1}_${x._2}"))
        assert(got(i.toLong) == expect,
          s"left $i (k=$k, t=$t): got ${got(i.toLong)}, want $expect")
      }
    }
  }

  test("bucket-prune exact quantiles equal Spark's exact percentile") {
    import graft.ops.Quantiles
    val gen = Gen.zip(
      Gen.listOfN(80, Gen.zip(Gen.chooseNum(0, 2), Gen.oneOf(
        Gen.chooseNum(-500.0, 500.0),                  // near-unique values
        Gen.chooseNum(0, 5).map(_.toDouble * 37.0)))), // heavy ties on bucket edges
      Gen.oneOf(0.0, 0.1, 0.5, 0.9, 1.0))
    forAll(gen, 8) { case (rows, q) =>
      val df = rows.toDF("g", "v")
      val got = Quantiles.groupQuantiles(df, "g",
        Seq(Quantiles.Measure("qv", "v", q, 37.0)))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val want = df.groupBy("g").agg(expr(s"percentile(v, $q)").as("p"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (g, v) =>
        assert(math.abs(v - want(g)) < 1e-9, s"g=$g q=$q: $v vs ${want(g)}")
      }
    }
  }

  test("multi-measure quantiles (same and distinct columns) equal exact percentile") {
    import graft.ops.Quantiles
    val gen = Gen.listOfN(70, Gen.zip(
      Gen.chooseNum(0, 2),
      Gen.chooseNum(-500.0, 500.0),
      Gen.oneOf(Gen.chooseNum(-40.0, 40.0), Gen.const(37.0)))) // ties on w
    forAll(gen, 6) { rows =>
      val df = rows.toDF("g", "v", "w")
      // two fractions on the SAME column (the q_agg_approx_quantile
      // shape — one exploded scan feeds both) plus one on a second
      // column, all in one pass
      val got = Quantiles.groupQuantiles(df, "g", Seq(
          Quantiles.Measure("v50", "v", 0.5, 37.0),
          Quantiles.Measure("v99", "v", 0.99, 37.0),
          Quantiles.Measure("w10", "w", 0.1, 7.0)))
        .collect().map(r => r.getInt(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      val want = df.groupBy("g").agg(
          expr("percentile(v, 0.5)").as("v50"), expr("percentile(v, 0.99)").as("v99"),
          expr("percentile(w, 0.1)").as("w10"))
        .collect().map(r => r.getInt(0) ->
          (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (g, (a, b, c)) =>
        val (wa, wb, wc) = want(g)
        assert(math.abs(a - wa) < 1e-9 && math.abs(b - wb) < 1e-9 &&
          math.abs(c - wc) < 1e-9, s"g=$g: ($a,$b,$c) vs ($wa,$wb,$wc)")
      }
    }
  }

  test("histogram quantiles equal bucket-prune quantiles BITWISE on integer domains") {
    import graft.ops.Quantiles
    // integer value domain with heavy ties — the q_text_length_filter
    // shape (token counts): histQuantiles runs off the (g, v, c)
    // histogram, groupQuantiles off the raw rows; same rank and
    // interpolation arithmetic, so == (not ±ε) is the contract
    val gen = Gen.zip(
      Gen.listOfN(90, Gen.zip(Gen.chooseNum(0, 2),
        Gen.chooseNum(1, 12).map(_.toDouble))),
      Gen.oneOf(0.0, 0.05, 0.5, 0.95, 1.0))
    forAll(gen, 8) { case (rows, q) =>
      val df = rows.toDF("g", "v")
      val hist = df.groupBy("g", "v").agg(count(lit(1)).as("c"))
      val got = Quantiles.histQuantiles(hist, Seq("qv" -> q))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val want = Quantiles.groupQuantiles(df, "g",
        Seq(Quantiles.Measure("qv", "v", q, 1.0)))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(got == want, s"q=$q: $got vs $want")
    }
  }

  test("histQuantilesOf equals bucket-prune quantiles BITWISE on decimal (price) domains") {
    import graft.ops.Quantiles
    // 2-dp cent-grid DECIMAL values with ties — the l_extendedprice /
    // l_quantity shape the round-19 trio rewrite routes through the
    // raw-rows histogram entry point (histQuantilesOf builds the
    // (g, v, c) histogram itself, including the early double cast);
    // NULL values must be excluded identically by both paths. == (not
    // ±ε) is the contract: same rank and interpolation arithmetic.
    val gen = Gen.zip(
      Gen.listOfN(90, Gen.zip(Gen.chooseNum(0, 2), Gen.oneOf(
        Gen.chooseNum(100, 9999999).map(c => BigDecimal(c) / 100),
        Gen.chooseNum(1, 8).map(k => BigDecimal(k * 3700) / 100), // heavy ties
        Gen.const(null: BigDecimal)))),
      Gen.oneOf(0.0, 0.5, 0.9, 0.99, 1.0))
    forAll(gen, 8) { case (rows, q) =>
      if (rows.exists(_._2 != null)) {
        val df = rows.toDF("g", "v")
          .withColumn("v", col("v").cast("decimal(12,2)"))
        val got = Quantiles.histQuantilesOf(df, "g", "v", Seq("qv" -> q))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        val want = Quantiles.groupQuantiles(df, "g",
          Seq(Quantiles.Measure("qv", "v", q, 4096.0)))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
        assert(got == want, s"q=$q: $got vs $want")
      }
    }
  }

  test("Json.str/getString round-trips arbitrary strings") {
    val tricky = Gen.oneOf(
      Gen.asciiStr, // includes control chars and quotes
      Gen.listOf(Gen.oneOf('"', '\\', '\n', '\r', '\t', '\u0001', 'é', '中', 'x'))
        .map(_.mkString))
    forAll(Gen.zip(tricky, tricky), 40) { case (k0, v) =>
      val key = if (k0.isEmpty) "k" else k0
      val json = engine.Json.obj(key -> engine.Json.str(v),
        "other" -> engine.Json.str("noise"))
      assert(engine.Json.getString(json, key).contains(v), s"key=$key v=$v")
    }
  }

  test("Multipart.firstFile recovers arbitrary binary bodies byte-exactly") {
    val bytes = Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)
    forAll(bytes, 25) { content =>
      val boundary = "bXYZ123"
      // the body may not contain the boundary marker (mirrors real MIME,
      // where the boundary is chosen to not collide with content)
      val safe = content
      val head = (s"--$boundary\r\n" +
        "Content-Disposition: form-data; name=\"file\"; filename=\"f.bin\"\r\n" +
        "Content-Type: application/octet-stream\r\n\r\n").getBytes("ISO-8859-1")
      val tail = s"\r\n--$boundary--\r\n".getBytes("ISO-8859-1")
      val got = engine.Multipart.firstFile(
        s"multipart/form-data; boundary=$boundary", head ++ safe ++ tail)
      assert(got.isDefined)
      assert(got.get._1 == "f.bin")
      assert(java.util.Arrays.equals(got.get._2, safe))
    }
  }

  test("salted join result is independent of the salt count") {
    forAll(Gen.chooseNum(1, 16), 6) { salts: Int =>
      val l = Seq((1L, 10), (1L, 20), (2L, 30), (3L, 40)).toDF("k", "v")
      val r = Seq((1L, "a"), (2L, "b"), (2L, "c")).toDF("rk", "w")
      val plain = l.join(r, col("k") === col("rk"))
        .collect().map(_.toString).sorted.toSeq
      // forcedHot: the 4-row frame is far below any detection threshold,
      // and this property is about the salting MECHANICS (result
      // independent of the salt count), so every key is treated hot
      val salted = ops.Skew.saltedJoin(l, r, "k", "rk", "v", salts,
        forcedHot = Some(Seq(1L, 2L, 3L)))
        .select(col("k"), col("v"), col("rk"), col("w"))
        .collect().map(_.toString).sorted.toSeq
      assert(salted == plain)
    }
  }

  test("simhash wide-key blocking is a complete cover for Hamming <= 3") {
    // The q_dedup_simhash candidate generator replaced 4x15-bit chunk
    // keys with C(6,3)=20 wide 30-bit combination keys (BENCH_NOTES.md,
    // round 12). Exactness rests on one claim: any two 60-bit
    // signatures within Hamming distance 3 share >= 1 key. Pigeonhole
    // argument aside, exercise the PRODUCTION key expressions
    // (ops.Dedup.simhashBlockKeys) over randomized signatures with
    // every flip count 0..3 at random positions — plus the sharp edge:
    // distance 4 spread over 4 DISTINCT blocks must share NO key (every
    // 3-subset of blocks hits a flipped one), which pins both the cover
    // and its tightness.
    val rnd = new scala.util.Random(2026)
    val cases = (1 to 400).map { i =>
      val sig = rnd.nextLong() & ((1L << 60) - 1)
      val nFlips = i % 4
      val flips = rnd.shuffle((0 until 60).toList).take(nFlips)
      (sig, flips.foldLeft(sig)((s, b) => s ^ (1L << b)), true)
    } ++ (1 to 100).map { _ =>
      val sig = rnd.nextLong() & ((1L << 60) - 1)
      // one flipped bit in each of 4 distinct 10-bit blocks
      val blocks = rnd.shuffle((0 until 6).toList).take(4)
      val far = blocks.foldLeft(sig)((s, b) => s ^ (1L << (b * 10 + rnd.nextInt(10))))
      (sig, far, false)
    }
    val df = cases.toDF("a", "b", "expectShared")
    val keysA = array(ops.Dedup.simhashBlockKeys(col("a")): _*)
    val keysB = array(ops.Dedup.simhashBlockKeys(col("b")): _*)
    val bad = df.select(col("a"), col("b"), col("expectShared"),
        arrays_overlap(keysA, keysB).as("shared"))
      .filter(col("shared") =!= col("expectShared"))
      .collect()
    assert(bad.isEmpty, s"blocking cover violated for: ${bad.take(3).mkString("; ")}")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // Definitional re-derivation of the segment dedup: walk documents in
  // (doc_id, seg_idx) order keeping first occurrences, compare the full
  // reassembled output; plus the global invariant Σ n_kept ≡ number of
  // distinct segments in the corpus.
  test("segment dedup equals the sequential first-occurrence definition") {
    val docs = ops.Tables.documents(spark, TestSpark.Sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    def segsOf(text: String): Seq[String] = {
      val tk = text.split(" ", -1)
      val n = math.max(1, math.ceil(tk.length / 8.0).toInt)
      (0 until n).map(i => tk.slice(i * 8, math.min(tk.length, i * 8 + 8)).mkString(" "))
    }
    val seen = collection.mutable.HashSet[String]()
    val expected = docs.map { case (id, text) =>
      val ss = segsOf(text)
      val kept = ss.filter(seen.add)
      (id, ss.size.toLong, kept.size.toLong, kept.mkString(" "))
    }.toSeq
    val actual = SparkEntry.queries("q_text_segment_dedup")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(actual == expected)
    assert(actual.map(_._3).sum == seen.size,
      "sum of kept segments must equal the corpus-wide distinct segment count")
  }

  test("token chunking equals the sequential stride-window definition") {
    val W = 32; val S = 24
    val docs = ops.Tables.documents(spark, TestSpark.Sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val expected = docs.flatMap { case (id, text) =>
      val tk = text.split(" ", -1)
      val starts = 0 until tk.length by S
      starts.map { st =>
        val ct = tk.slice(st, math.min(tk.length, st + W))
        (id, (st / S).toLong, ct.length.toLong, ct.mkString(" "))
      }
    }.toSeq
    val actual = SparkEntry.queries("q_text_chunk")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(actual == expected)
    // chunk-count closure: per doc, ceil(n/S) chunks and the last chunk
    // ends exactly at the token count (full coverage, no phantom tail)
    val byDoc = actual.groupBy(_._1)
    docs.foreach { case (id, text) =>
      val n = text.split(" ", -1).length
      val ch = byDoc(id).sortBy(_._2)
      assert(ch.size == math.ceil(n.toDouble / S).toInt)
      assert(ch.last._2 * S + ch.last._3 == n)
    }
  }

  test("winnowing fingerprints equal the sequential definition; subset of gram hashes") {
    val K = 3; val W = 4
    def h(s: String): Long =
      java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)
    val docs = ops.Tables.documents(spark, TestSpark.Sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val expected = docs.flatMap { case (id, text) =>
      val tk = text.split(" ", -1)
      if (tk.length < K + W - 1) None else {
        val gh = (0 to tk.length - K).map(i => h(tk.slice(i, i + K).mkString(" ")))
        val fps = (0 to gh.length - W).map(j => gh.slice(j, j + W).min)
          .distinct.sorted
        // every gram window contributes its min → fingerprint density ≥
        // one per window; and every fingerprint IS some gram hash
        assert(fps.toSet.subsetOf(gh.toSet))
        Some((id, fps.size.toLong, md5hex(fps.mkString(","))))
      }
    }.toSeq
    val actual = SparkEntry.queries("q_text_winnow")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(actual == expected)
  }

  test("cross-doc duplicated windows equal the sequential definition") {
    val W = 16
    def h(s: String): String = md5hex(s)
    val docs = ops.Tables.documents(spark, TestSpark.Sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val winOf = docs.map { case (id, text) =>
      val tk = text.split(" ", -1)
      id -> (0 to tk.length - W).map(i => h(tk.slice(i, i + W).mkString(" ")))
    }.toMap
    val docsPerHash = winOf.toSeq.flatMap { case (id, ws) => ws.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (k, v) => k -> v.size }
    val expected = docs.map { case (id, _) =>
      val ws = winOf(id)
      val nd = ws.count(w => docsPerHash(w) >= 2)
      val frac = if (ws.isEmpty) 0.0
        else BigDecimal(nd.toDouble / ws.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, ws.size.toLong, nd.toLong, frac)
    }.toSeq
    val actual = SparkEntry.queries("q_text_substring_dup")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(actual == expected)
    assert(actual.exists(_._3 > 0), "corpus should contain cross-doc duplicated spans")
  }

  // Source cap: re-derive the exact pick set (count → threshold →
  // md5-ordered top-5) sequentially and compare; cap and rank-sequence
  // invariants hold per source.
  test("per-source cap equals the sequential hash-order definition") {
    val docs = ops.Tables.documents(spark, TestSpark.Sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      val n = rows.size
      val thresh = math.ceil(math.min(1.0, 2.0 * 5 / n) * 4294967296.0).toLong
      rows.map(_._1)
        .filter(id => java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) < thresh)
        .sortBy(id => (md5hex(id.toString), id))
        .take(5).zipWithIndex
        .map { case (id, i) => (src, (i + 1).toLong, id) }
    }.sortBy(t => (t._1, t._2))
    val actual = SparkEntry.queries("q_corpus_source_cap")(spark, TestSpark.Sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(actual == expected)
    actual.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.size <= 5, s"source $src over cap")
      assert(rows.map(_._2).sorted == (1L to rows.size).toSeq, s"rank gap in $src")
    }
  }

  // The one-pass ScriptCounts kernel must agree with the regex
  // formulation it replaced, on arbitrary text including CJK,
  // supplementary-plane codepoints (surrogate pairs), and empties.
  test("script_counts kernel equals the four-regex formulation") {
    val texts = Seq("", " ", "abc XYZ 123", "北京 hello 42",
      "一鿿 edge of the cjk block", "emoji 😀 astral",
      "mixed 北京123 abc  double  space", "\t\nnon-space whitespace") ++
      samples(Gen.listOf(Gen.oneOf(
        Gen.alphaNumChar, Gen.const(' '), Gen.const('北'),
        Gen.const('一'), Gen.const('鿿'), Gen.const('\uD83D'))
      ).map(_.mkString), 40).map(s =>
        // strip lone high surrogates ScalaCheck may synthesize — they
        // are not valid UTF-8 scalar values and never reach the kernel
        // through Spark's UTF8String
        s.filterNot(c => Character.isSurrogate(c)))
    val df = texts.toDF("t")
    val viaKernel = df.select(
      graft.functions.TextExprs.scriptCounts(col("t")).as("c")).collect()
      .map(_.getSeq[Long](0))
    val viaRegex = df.select(
      length(col("t")).cast("long"),
      length(regexp_replace(col("t"), "[^A-Za-z]", "")).cast("long"),
      length(regexp_replace(col("t"), "[^0-9]", "")).cast("long"),
      length(regexp_replace(col("t"), "[^一-鿿]", "")).cast("long"),
      (length(col("t")) - length(regexp_replace(col("t"), " ", ""))).cast("long"))
      .collect().map(r => Seq(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    viaKernel.zip(viaRegex).zip(texts).foreach { case ((k, r), t) =>
      assert(k == r, s"kernel/regex disagree on ${t.take(40)}: $k vs $r")
    }
  }

  test("bpe_token_count kernel equals the pre-tokenizer regex match count") {
    // the GPT-2-ish alternation ` ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+`:
    // a match starts exactly at every class-run boundary, spaces attach
    // but never split or create runs — the kernel counts boundaries in
    // one byte walk, and multibyte codepoints (all bytes ≥ 0x80) merge
    // into the `other` class exactly like the regex's complement class
    val texts = Seq("", " ", "   ", "abc", " abc", "a5", "5a", "a.b",
      "..a..", "a  b", ". .", "tab\there", "北京 hello 42", "emoji 😀!x",
      "café au lait", "1,234.56", "-3", "a-b_c d", "\n\n", "x y") ++
      samples(Gen.listOf(Gen.oneOf(
        Gen.alphaNumChar, Gen.const(' '), Gen.const('.'), Gen.const(','),
        Gen.const('北'), Gen.const('é'), Gen.const('\t'))
      ).map(_.mkString), 40)
    val df = texts.toDF("t")
    val viaKernel = df.select(
      graft.functions.TextExprs.bpeTokenCount(col("t")).as("c")).collect()
      .map(_.getLong(0))
    val viaRegex = df.select(size(regexp_extract_all(col("t"),
        lit(" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"), lit(0))).cast("long"))
      .collect().map(_.getLong(0))
    viaKernel.zip(viaRegex).zip(texts).foreach { case ((k, r), t) =>
      assert(k == r, s"kernel/regex disagree on ${t.take(40)}: $k vs $r")
    }
  }

  // Bloom screen: n_exact must equal the driver-derived exact
  // containment (proving the map-side screen admitted every true hit),
  // and the bloom candidate count can only over-approximate it.
  test("bloom screen never loses a true containment hit") {
    val docs = ops.Tables.documents(spark, TestSpark.Sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(text: String): Set[String] = {
      val tk = text.split(" ", -1)
      if (tk.length < 3) Set.empty
      else tk.sliding(3).map(_.mkString(" ")).toSet
    }
    val teSet = docs.filter(_._1 % 2 == 1).flatMap(d => shingles(d._2)).toSet
    val expected = docs.filter(_._1 % 2 == 0).map { case (id, text) =>
      val sh = shingles(text)
      (id, sh.size.toLong, sh.count(teSet.contains).toLong)
    }.filter(_._2 > 0).sortBy(_._1).toSeq
    val actual = SparkEntry.queries("q_corpus_bloom_screen")(spark, TestSpark.Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(actual.map(t => (t._1, t._2, t._4)) == expected)
    actual.foreach(t => assert(t._3 >= t._4,
      s"doc ${t._1}: bloom candidates ${t._3} < exact hits ${t._4}"))
  }

  // BitSetContains (the round-16 bloom probe) ships its generated-code
  // path through doGenCode and its interpreted path through
  // nullSafeEval — force the interpreter and pin that the two agree on
  // the whole bloom result (the codegen path is what the default run
  // above exercised; a codegen/eval split is the classic custom-
  // Expression bug class).
  test("bloom probe: interpreted eval equals codegen") {
    val viaCodegen = SparkEntry.queries("q_corpus_bloom_screen")(spark, TestSpark.Sf)
      .collect().map(_.toString).sorted.toSeq
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val viaEval = SparkEntry.queries("q_corpus_bloom_screen")(spark, TestSpark.Sf)
        .collect().map(_.toString).sorted.toSeq
      assert(viaEval == viaCodegen,
        s"interpreted/codegen split: ${viaEval.size} vs ${viaCodegen.size} rows")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  // Round 20: the PqAdc kernel (q_sim_pq's encode+ADC pass) must equal
  // the composed HOF formulation it replaced — same dimension-order
  // double accumulation, same floor(·1e6 + 0.5) micro-scaling, same
  // strict-< tie to the smaller codeword id — on random float vectors
  // and codebooks, through BOTH the codegen and interpreted paths.
  test("pq_adc kernel equals the composed aggregate/zip_with formulation") {
    val m = 4; val sub = 4; val dim = m * sub; val k = 5
    val rnd = new scala.util.Random(20L)
    def vec(): Seq[Float] = Seq.fill(dim)((rnd.nextInt(41) - 20) / 8.0f)
    val rows = Seq.fill(60)(vec())
    // duplicate-codeword codebook entries force argmin TIES — the
    // smaller j must win on both paths
    val cw0 = Seq.fill(sub)(0.125)
    val cbn: Seq[Seq[Seq[Double]]] = Seq.fill(m)(
      cw0 +: cw0 +: Seq.fill(k - 2)(Seq.fill(sub)((rnd.nextInt(41) - 20) / 8.0)))
    val tabn: Seq[Seq[Long]] = Seq.fill(m)(Seq.fill(k)(rnd.nextInt(1000000).toLong))
    val df = rows.toDF("emb")
      .withColumn("v", transform(col("emb"), x => x.cast("double")))
      .withColumn("cbn", typedLit(cbn))
      .withColumn("tabn", typedLit(tabn))
    def l2m(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      floor(aggregate(zip_with(a, b, (x, c) => (x - c) * (x - c)),
        lit(0.0), (acc, t) => acc + t) * 1000000.0 + 0.5).cast("long")
    val zero = struct(lit(Long.MaxValue).as("dist"), lit(-1).as("j"))
    val composed = df.select(
      aggregate(sequence(lit(0), lit(m - 1)), lit(0L), (acc, ss) => {
        val vs = slice(col("v"), ss * sub + 1, lit(sub))
        val code = aggregate(sequence(lit(0), lit(k - 1)), zero, (accJ, jj) => {
          val dd = l2m(vs, element_at(element_at(col("cbn"), ss + 1), jj + 1))
          when(dd < accJ.getField("dist"),
            struct(dd.as("dist"), jj.as("j"))).otherwise(accJ)
        }).getField("j")
        acc + element_at(element_at(col("tabn"), ss + 1), code + 1)
      }).as("adm")).collect().map(_.getLong(0)).toSeq
    def kernelRun(): Seq[Long] = df.select(
      graft.functions.VectorExprs.pq_adc(col("emb"), col("cbn"), col("tabn"))
        .as("adm")).collect().map(_.getLong(0)).toSeq
    assert(kernelRun() == composed, "codegen kernel != composed form")
    // float input widened in-kernel ≡ pre-cast double input
    val viaDouble = df.select(
      graft.functions.VectorExprs.pq_adc(col("v"), col("cbn"), col("tabn"))
        .as("adm")).collect().map(_.getLong(0)).toSeq
    assert(viaDouble == composed, "double-input kernel != composed form")
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(kernelRun() == composed, "interpreted kernel != composed form")
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  // Round 20: q_window_rank's bucketed decomposition must reproduce the
  // native ≤3-partition window exactly (the window order is total, so
  // rank ≡ dense_rank ≡ row_number ≡ the decomposed global position).
  test("q_window_rank decomposition equals the native window") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val native = ops.Tables.orders(spark, TestSpark.Sf)
      .select(col("o_orderkey"), col("o_orderstatus"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rk"),
        dense_rank().over(w).cast("long").as("drk"))
      .orderBy("o_orderstatus", "rn")
      .collect().map(_.toString).toSeq
    val decomposed = SparkEntry.queries("q_window_rank")(spark, TestSpark.Sf)
      .collect().map(_.toString).toSeq
    assert(decomposed == native)
  }

  // Round 20: q_tpch_q21_shape's window decorrelation must equal the
  // semi/anti self-join formulation it replaced, row for row.
  test("q21 window decorrelation equals the semi/anti self-join formulation") {
    val li = ops.Tables.lineitem(spark, TestSpark.Sf)
    val l1 = li.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("sk2"))
    val l3 = li.select(col("l_orderkey").as("k3"), col("l_suppkey").as("sk3"),
      col("l_shipdate").as("sd3"))
    val reference = l1
      .join(ops.Tables.orders(spark, TestSpark.Sf)
          .filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .join(l2, col("k2") === col("l_orderkey") &&
        col("sk2") =!= col("l_suppkey"), "left_semi")
      .join(l3, col("k3") === col("l_orderkey") &&
        col("sk3") =!= col("l_suppkey") &&
        col("sd3") > col("l_shipdate"), "left_anti")
      .join(ops.Tables.supplier(spark, TestSpark.Sf),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(ops.Tables.nation(spark, TestSpark.Sf)
          .filter(col("n_name") === "NATION_12")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .collect().map(_.toString).toSeq
    val windowed = SparkEntry.queries("q_tpch_q21_shape")(spark, TestSpark.Sf)
      .collect().map(_.toString).toSeq
    assert(windowed == reference)
  }

  // Round 20: the weighted frequency sketch (histogram-fed) must keep
  // the deterministic Misra-Gries envelope the operator queries pin —
  // lower ≤ exact ≤ upper for every item — and collapse to exact
  // counts below map capacity, exactly like row-at-a-time updates.
  test("weighted freq sketch keeps the exact-below-capacity envelope") {
    import graft.functions.SketchExprs
    val rnd = new scala.util.Random(7L)
    val hist = (1 to 200).map(i => (i.toLong, (rnd.nextInt(1000) + 1).toLong))
    val df = hist.toDF("item", "c")
    val sk = df.agg(SketchExprs.freqSketchAggW(col("item"), col("c")).as("sk"))
    val checked = sk.crossJoin(df)
      .select(col("item"), col("c"),
        SketchExprs.freqLowerBound(col("sk"), col("item")).as("lo"),
        SketchExprs.freqUpperBound(col("sk"), col("item")).as("hi"))
      .collect()
    checked.foreach { r =>
      val (item, c, lo, hi) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(lo <= c && c <= hi, s"envelope broken for $item: $lo ≤ $c ≤ $hi")
      // 200 items < 512-entry map capacity → no eviction → exact
      assert(lo == c && hi == c, s"below capacity not exact for $item")
    }
  }

  // Round 20: the property that lets q_agg_approx_distinct /
  // q_agg_hll_merge sketch the DISTINCT pairs instead of raw rows.
  // Two different strengths, pinned separately:
  //  - Spark's approx_count_distinct (HLL++) keeps only max-based
  //    registers → BIT-IDENTICAL over the distinct support vs the
  //    multiset (q_agg_approx_distinct's hll_ok input is unchanged
  //    exactly).
  //  - Datasketches hll_sketch_agg adds an HIP estimator that is
  //    sensitive to the INSERTION ORDER of novel values (measured
  //    ~0.5% shift when the feed order changes), so its estimate is
  //    only envelope-stable — which is precisely what q_agg_hll_merge
  //    pins (est within 5% of exact, TRUE either way).
  test("HLL over distinct support: HLL++ bitwise, Datasketches inside the pinned envelope") {
    val li = ops.Tables.lineitem(spark, TestSpark.Sf)
      .select(col("l_returnflag"), col("l_orderkey"))
    def run(src: org.apache.spark.sql.DataFrame) = src.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey")).as("a"),
        countDistinct(col("l_orderkey")).as("n"),
        expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey))").as("e"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3).toDouble)).toSeq
    val raw = run(li)
    val dedup = run(li.distinct())
    assert(raw.map(t => (t._1, t._2)) == dedup.map(t => (t._1, t._2)),
      "HLL++ (approx_count_distinct) must be bitwise dedup-invariant")
    (raw ++ dedup).foreach { case (f, _, n, e) =>
      assert(math.abs(e - n) / n <= 0.05,
        s"Datasketches estimate outside the pinned envelope for $f: $e vs $n")
    }
  }

  // Round 21: the weighted-insert quantile summary that lets
  // q_agg_approx_quantile / q_agg_kll_merge feed their sketch branch
  // from the value histogram the exact side already builds (the
  // FreqSketchAggW precedent applied to quantiles). Two strengths:
  //  - below capacity (≤ MaxEntries distinct values, no compaction)
  //    the estimate is EXACTLY the inclusive-rank weighted quantile;
  //  - above capacity, through merge trees and compactions, the
  //    estimate's true normalized rank stays within 2% of the target —
  //    far inside the 5% VALUE envelope the operator queries pin.
  test("weighted quantile summary: exact below capacity, rank-bounded above") {
    import graft.functions.WqSummary
    def exactQ(hist: Seq[(Double, Long)], q: Double): Double = {
      val sorted = hist.sortBy(_._1)
      val total = sorted.map(_._2).sum
      val target = math.max(1L, math.ceil(q * total).toLong)
      var cum = 0L
      sorted.find { case (_, w) => cum += w; cum >= target }.get._1
    }
    // normalized true-rank window of an estimate within the multiset
    def rankWindow(hist: Seq[(Double, Long)], est: Double): (Double, Double) = {
      val total = hist.map(_._2).sum.toDouble
      val below = hist.collect { case (v, w) if v < est => w }.sum.toDouble
      val atOrBelow = below + hist.collect { case (v, w) if v == est => w }.sum
      (below / total, atOrBelow / total)
    }
    val rnd = new scala.util.Random(11L)
    val dists: Seq[(String, Seq[(Double, Long)])] = Seq(
      "uniform" -> (1 to 20000).map(_ => (rnd.nextDouble() * 1e6, rnd.nextInt(50) + 1L)),
      "zipf-heavy" -> (1 to 20000).map(i => (i.toDouble, 200000L / i + 1L)),
      "sorted" -> (1 to 30000).map(i => (i.toDouble, 3L)),
      "reverse-sorted" -> (30000 to 1 by -1).map(i => (i.toDouble, 7L)),
      "few-distinct" -> (1 to 40).map(i => (i.toDouble, rnd.nextInt(100000) + 1L)),
      "constant" -> Seq((42.0, 1000000L)))
    for ((name, hist) <- dists; q <- Seq(0.01, 0.5, 0.9, 0.99)) {
      // exercise the merge path the way Spark's combiner tree does:
      // 7 partial summaries merged pairwise
      val parts = hist.grouped(math.max(1, hist.size / 7 + 1)).map { chunk =>
        val s = new WqSummary
        chunk.foreach { case (v, w) => s.add(v, w) }
        s
      }.toSeq
      val merged = parts.reduce(_ mergeInPlace _)
      val est = merged.quantile(q).asInstanceOf[Double]
      if (hist.map(_._1).distinct.size <= WqSummary.MaxEntries && parts.size == 1) {
        assert(est == exactQ(hist, q), s"$name q=$q: below capacity must be exact")
      }
      val (lo, hi) = rankWindow(hist, est)
      assert(lo - 0.02 <= q && q <= hi + 0.02,
        s"$name q=$q: estimate $est has true rank window [$lo, $hi], " +
          "outside the 2% envelope")
    }
    // single-summary below-capacity exactness, explicitly
    val small = (1 to 40).map(i => (i.toDouble, (i * 13 % 97 + 1).toLong))
    val s = new WqSummary
    small.foreach { case (v, w) => s.add(v, w) }
    Seq(0.0, 0.25, 0.5, 0.75, 1.0).foreach { q =>
      assert(s.quantile(q) == exactQ(small, q))
    }
  }

  // Round 21: the DataFrame surface — per-group weighted summaries off
  // a (group, value, count) histogram, rolled up with wq_merge_agg,
  // stay inside the 5% VALUE envelope the operator queries pin, on the
  // repo's own lineitem distribution (the exact workload shape).
  test("wq sketch aggregates track histogram quantiles within the pinned envelope") {
    import graft.functions.{WeightedQuantile => WQ}
    val hist = ops.Tables.lineitem(spark, TestSpark.Sf)
      .groupBy(col("l_returnflag").as("g"),
        col("l_extendedprice").cast("double").as("v"))
      .agg(count(lit(1)).as("c"))
    val exact = ops.Quantiles.histQuantiles(hist,
      Seq("p50" -> 0.5, "p99" -> 0.99))
    val sk = hist.groupBy("g")
      .agg(WQ.wqSketchAgg(col("v"), col("c")).as("sk"))
    val est = sk.select(col("g"),
      WQ.wqQuantile(col("sk"), 0.5).as("a50"),
      WQ.wqQuantile(col("sk"), 0.99).as("a99"))
    est.join(exact, "g").collect().foreach { r =>
      val (a50, a99) = (r.getDouble(1), r.getDouble(2))
      val (p50, p99) = (r.getDouble(3), r.getDouble(4))
      assert(math.abs(a50 - p50) / p50 <= 0.05, s"${r.getString(0)} p50: $a50 vs $p50")
      assert(math.abs(a99 - p99) / p99 <= 0.05, s"${r.getString(0)} p99: $a99 vs $p99")
    }
    // rollup: merged global summary vs the global histogram quantile
    val gexact = ops.Quantiles.histQuantiles(
      hist.groupBy("v").agg(sum(col("c")).as("c")).select(lit("ALL").as("g"), col("v"), col("c")),
      Seq("gp50" -> 0.5)).select("gp50").head().getDouble(0)
    val gest = sk.agg(WQ.wqQuantile(WQ.wqMergeAgg(col("sk")), 0.5).as("est"))
      .head().getDouble(0)
    assert(math.abs(gest - gexact) / gexact <= 0.05, s"merged: $gest vs $gexact")
  }

  // Round 21: the NearestCid kernel that turned semantic dedup's
  // nearest-centroid assignment into a map-only projection must
  // reproduce the composed crossJoin + max_by(id, struct(cos, -id))
  // formulation EXACTLY — same dot (dimension-order double accum),
  // same double comparator (SQLOrderingUtil, the one struct ordering
  // applies inside max_by), ties to the smaller id — on the repo's own
  // embeddings, for both the consider-all path (gid = -1) and the
  // gid-filtered two-level path.
  test("nearest_cid kernel equals the composed crossJoin/max_by argmax") {
    import graft.functions.VectorExprs
    val g = 3
    val vn = ops.Tables.embeddings(spark, TestSpark.Sf)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nv", sqrt(VectorExprs.dot_product(col("v"), col("v"))))
    val cent = vn.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("v").as("c"),
        pmod(col("vec_id"), lit(g)).cast("long").as("gid"))
      .withColumn("nc", sqrt(VectorExprs.dot_product(col("c"), col("c"))))
    // composed, consider-all: argmax over every centroid
    val composedAll = vn.crossJoin(broadcast(cent))
      .withColumn("cos", VectorExprs.dot_product(col("v"), col("c")) / (col("nv") * col("nc")))
      .groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("cos"), -col("cid"))).as("cid"))
    // composed, gid-filtered: vec_id % g picks the group, argmax within
    val composedGid = vn.withColumn("gid", pmod(col("vec_id"), lit(g)).cast("long"))
      .join(broadcast(cent), Seq("gid"))
      .withColumn("cos", VectorExprs.dot_product(col("v"), col("c")) / (col("nv") * col("nc")))
      .groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("cos"), -col("cid"))).as("cid"))
    val tbl = cent.agg(collect_list(struct(
      col("gid"), col("cid").as("id"), col("nc"), col("c"))).as("cents"))
    val kernelAll = vn.crossJoin(broadcast(tbl))
      .select(col("vec_id"),
        VectorExprs.nearest_cid(col("v"), col("nv"), lit(-1L), col("cents")).as("cid"))
    val kernelGid = vn.crossJoin(broadcast(tbl))
      .select(col("vec_id"),
        VectorExprs.nearest_cid(col("v"), col("nv"),
          pmod(col("vec_id"), lit(g)).cast("long"), col("cents")).as("cid"))
    def m(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (ca, ka) = (m(composedAll), m(kernelAll))
    assert(ca == ka, s"consider-all diverged on ${ca.keySet.filter(k => ca(k) != ka(k)).take(5)}")
    val (cg, kg) = (m(composedGid), m(kernelGid))
    assert(cg == kg, s"gid-filtered diverged on ${cg.keySet.filter(k => cg(k) != kg(k)).take(5)}")
  }

  // Round 21: the md5 byte-readers that replaced the
  // conv(substring(md5(x), a, b), 16, 10) hex round-trip on the
  // signature hot paths (simhash tokens, minhash shingles, winnow
  // trigrams) must be bit-identical to the composed spelling — on the
  // repo's own token stream plus adversarial strings (empty, unicode,
  // digits that leading-zero the hex).
  test("md5_prefix60 / md5_chunks equal the conv(substring(md5)) spelling") {
    import graft.functions.HashFns
    val toks = ops.Tables.documents(spark, TestSpark.Sf)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "").limit(20000)
      .unionAll(Seq("", "a", "é漢", "0000", "ﬀ", "").toDF("tok"))
    val cmp60 = toks.select(
      conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long").as("composed"),
      HashFns.md5_prefix60(col("tok")).as("kernel"))
      .filter(col("composed") =!= col("kernel") ||
        col("composed").isNull =!= col("kernel").isNull)
    assert(cmp60.count() == 0, "md5_prefix60 diverged from the composed spelling")
    val cmpCh = toks.select(col("tok"),
      HashFns.md5_chunks(concat(lit("2:"), col("tok"))).as("ch"))
      .select((0 until 4).map(j =>
        (element_at(col("ch"), j + 1) =!=
          conv(substring(md5(concat(lit("2:"), col("tok"))), j * 8 + 1, 8), 16, 10)
            .cast("long")).as(s"d$j")): _*)
      .filter((0 until 4).map(j => col(s"d$j")).reduce(_ || _))
    assert(cmpCh.count() == 0, "md5_chunks diverged from the composed spelling")
  }
}
