package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Tables._

/** Training-corpus preparation operators (north-star scope, SURVEY.md §2
  * "LLM-data-pipeline"): deterministic stratified sampling, PII-style
  * redaction, fixed-width chunking, vocabulary building, and a
  * decimal-exact regression aggregate.
  *
  * Scale design notes:
  *  - The stratified sample is *hash-based* (md5 of the row key), not
  *    rand()-based: the same row is always in or out, the sample is
  *    reproducible across engines/runs/retries (DuckDB computes the
  *    identical predicate → full oracle check), and at 100 TB the filter
  *    is embarrassingly parallel with no RNG-state coordination.
  *  - Chunking and vocabulary are single explode + aggregation shapes —
  *    one shuffle each, map-side combine does the heavy lifting.
  *  - The regression aggregate accumulates its five moments in exact
  *    DECIMAL (order-independent) and applies the closed-form OLS
  *    formulas on the final doubles in a fixed association order, so the
  *    result is bit-identical to the sequential oracle.
  */
object Corpus {

  val queries: Seq[OpQuery] = Seq(

    // Deterministic hash-stratified sampling: per-stratum rates
    // (A: 5 %, N: 10 %, R: 20 %) decided by md5(row key) mod 100.
    OpQuery("q_sample_stratified",
      s"""WITH sampled AS (
         |  SELECT l_returnflag, l_quantity
         |  FROM lineitem
         |  WHERE CAST('0x' || substr(md5(l_orderkey || ':' || l_linenumber), 1, 8) AS BIGINT) % 100
         |        < CASE l_returnflag WHEN 'A' THEN 5 WHEN 'N' THEN 10 ELSE 20 END)
         |SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_sampled,
         |       ${oSum("l_quantity")} AS sum_qty
         |FROM sampled GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val h = conv(substring(md5(
        concat_ws(":", col("l_orderkey"), col("l_linenumber"))), 1, 8), 16, 10)
        .cast("long") % 100
      val rate = when(col("l_returnflag") === "A", 5)
        .when(col("l_returnflag") === "N", 10).otherwise(20)
      lineitem(s, d).filter(h < rate)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_sampled"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    },

    // PII-style redaction: mask digit runs in customer names, count the
    // masked characters (the audit column a redaction pipeline keeps).
    OpQuery("q_pii_redact",
      """SELECT c_custkey,
        |       regexp_replace(c_name, '[0-9]+', '<ID>', 'g') AS redacted,
        |       CAST(length(c_name) - length(regexp_replace(c_name, '[0-9]', '', 'g')) AS BIGINT) AS n_masked
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      customer(s, d).select(col("c_custkey"),
          regexp_replace(col("c_name"), "[0-9]+", "<ID>").as("redacted"),
          (length(col("c_name")) -
            length(regexp_replace(col("c_name"), "[0-9]", ""))).cast("long").as("n_masked"))
        .orderBy("c_custkey")
    },

    // Fixed-width chunking with overlap (50-char windows, stride 40) —
    // the document → training-sample splitter. One explode, no shuffle
    // until the output sort.
    OpQuery("q_chunk_split",
      """SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
        |       substr(text, i*40 + 1, 50) AS chunk
        |FROM documents, UNNEST(range(0, greatest(1, (length(text) - 1) // 40 + 1))) AS u(i)
        |ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
      // greatest(0, …) clamps the empty-text case: without it Spark's
      // sequence(0, -1) emits a descending [0, -1] (two bogus chunks)
      // while range(0, 0) emits none — both sides now emit exactly one
      // (empty) chunk for an empty document.
      documents(s, d)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0),
            greatest(lit(0), floor((length(col("text")) - 1) / lit(40))).cast("int"))).as("cid"))
        .select(col("doc_id"), col("cid").cast("long").as("chunk_id"),
          col("text").substr(col("cid") * 40 + 1, lit(50)).as("chunk"))
        .orderBy("doc_id", "chunk_id")
    },

    // Vocabulary builder: corpus-wide token counts, rank, top 100.
    OpQuery("q_vocab_topk",
      """WITH toks AS (
        |  SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents),
        |counts AS (
        |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM toks WHERE tok <> '' GROUP BY tok)
        |SELECT tok, n, CAST(RANK() OVER (ORDER BY n DESC, tok) AS BIGINT) AS r
        |FROM counts ORDER BY r LIMIT 100""".stripMargin) { (s, d) =>
      documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("tok").agg(count(lit(1)).as("n"))
        // top-k FIRST (TakeOrderedAndProject), then rank the 100
        // survivors: the tie-break makes rank ≡ row_number ≡ position
        // in the limited sort, so the global window never sees the full
        // vocabulary (billions of tokens at corpus scale)
        .orderBy(col("n").desc, col("tok")).limit(100)
        .withColumn("r", row_number().over(
          Window.orderBy(col("n").desc, col("tok"))).cast("long"))
        .orderBy("r")
    },

    // Per-group OLS regression (slope/intercept/R²) via the native
    // regr_* aggregates — single-pass, codegen'd double moments on both
    // engines (round 1 built the moments in exact DECIMAL, which is
    // bit-stable but ~25× slower: Spark's wide-decimal sum leaves the
    // long-backed fast path). The engines merge partial moments in
    // different orders, so results agree only to ~1e-12 relative —
    // rounding to 6 dp stabilizes the comparison.
    OpQuery("q_agg_regression",
      """SELECT l_returnflag,
        |       ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        |       ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
        |       ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val p = col("l_extendedprice")
      val q = col("l_quantity")
      lineitem(s, d).groupBy("l_returnflag").agg(
          round(regr_slope(p, q), 6).as("slope"),
          round(regr_intercept(p, q), 6).as("intercept"),
          round(regr_r2(p, q), 6).as("r2"))
        .orderBy("l_returnflag")
    },

    // Unpivot / melt — wide metrics to long (Spark's native unpivot
    // operator; the oracle is the portable UNION ALL formulation).
    OpQuery("q_unpivot",
      """SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_size', CAST(p_size AS DOUBLE) FROM part
        |ORDER BY p_partkey, metric""".stripMargin) { (s, d) =>
      part(s, d)
        .select(col("p_partkey"), col("p_retailprice"), col("p_size").cast("double").as("p_size"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size")), "metric", "value")
        .orderBy("p_partkey", "metric")
    }
  )
}
