package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Testdata table loaders + shared determinism helpers.
  *
  * Every operator query must hash-match a DuckDB oracle running on the
  * same parquet (driver contract, Verify.scala). Floating-point
  * aggregation order differs between engines (Spark partial aggregates in
  * parallel; DuckDB sums sequentially), so money-style SUM/AVG go through
  * exact fixed-point LONG accumulation (×100 / ×1e6 into longs, sum
  * longs, scale back to DOUBLE at the end) — bit-identical on both
  * engines, order-independent because integer addition is associative,
  * and as fast as a plain long sum in the hash-agg fast path. At 100 TB
  * it is the same shuffle shape as a double sum.
  */
object Tables {
  /** Max on-disk bytes for a table to be cached (default 4 GiB,
    * override with -Dgraft.cache.max.bytes=N). Dimensions and bench-SF
    * facts fit far under it; a 100 TB fact table does not — caching it
    * would evict everything else and thrash executor storage memory, so
    * big tables stay scan-through and rely on data locality instead. */
  private[ops] def cacheMaxBytes: Long =
    sys.props.get("graft.cache.max.bytes").map(_.toLong).getOrElse(4L << 30)

  /** One recursive walker for (max lastModified, total bytes) over a
    * file or directory — shared by the cache size gate here, the
    * doc-count content signature in Dedup, and the streaming source's
    * schema-probe memo, so fixes to traversal (symlink cycles,
    * listFiles-null) land in one place. A canonical-path visited set
    * breaks symlink cycles: a directory already walked contributes
    * nothing on re-entry instead of recursing to StackOverflowError
    * (ADVICE r11). */
  private[graft] def mtimeAndBytes(path: String): (Long, Long) = {
    val seen = scala.collection.mutable.Set.empty[String]
    def walk(f: java.io.File): (Long, Long) =
      if (f.isDirectory) {
        if (!seen.add(f.getCanonicalPath)) (0L, 0L)
        else Option(f.listFiles).getOrElse(Array.empty).map(walk)
          .foldLeft((f.lastModified, 0L)) { case ((m, s), (m2, s2)) =>
            (math.max(m, m2), s + s2)
          }
      }
      else (f.lastModified, f.length)
    walk(new java.io.File(path))
  }

  private[ops] def onDiskBytes(path: String): Long = mtimeAndBytes(path)._2

  // ---- schema gate ----------------------------------------------------
  // Round-10 lesson: the driver regenerated the testdata and events.ts
  // changed physical type, turning every events query into a mid-plan
  // DATATYPE_MISMATCH AnalysisException with no hint of the real cause.
  // The loader now ASSERTS its schema assumptions up front and fails
  // with a message naming the table and the expected-vs-found type.
  // Expectations are type FAMILIES, not exact physical types, because
  // benign regeneration changes representation (date → timestamp[us],
  // TIMESTAMP(NANOS) → timestamp[us]) without changing meaning — the
  // gate must catch a *wrong* column, not a re-encoded one.
  private type TypeCheck = (String, DataType => Boolean)
  private def integral: TypeCheck = ("integral", {
    case ByteType | ShortType | IntegerType | LongType => true; case _ => false })
  private def fractional: TypeCheck = ("fractional", {
    case FloatType | DoubleType | _: DecimalType => true; case _ => false })
  private def text: TypeCheck = ("string", _ == StringType)
  /** date/timestamp in any timestamp representation. Deliberately does
    * NOT accept LongType: a long-typed date column would be a meaning
    * change, exactly what the gate exists to catch. */
  private def temporal: TypeCheck = ("temporal (date/timestamp)", {
    case DateType | TimestampType | TimestampNTZType => true; case _ => false })
  /** events.ts only: the legacy TIMESTAMP(NANOS) generation reads as a
    * raw nanos LongType under the compat flag (normalized by
    * [[normalizeTs]]), so this ONE column also accepts LongType. */
  private def eventTs: TypeCheck = ("temporal (date/timestamp/nanos-long)", {
    case DateType | TimestampType | TimestampNTZType | LongType => true; case _ => false })
  private def floatArray: TypeCheck = ("array<float|double>", {
    case ArrayType(FloatType | DoubleType, _) => true; case _ => false })

  /** Required columns (a superset may exist on disk) per testdata table. */
  private val expectedSchemas: Map[String, Seq[(String, TypeCheck)]] = Map(
    "region"   -> Seq("r_regionkey" -> integral, "r_name" -> text),
    "nation"   -> Seq("n_nationkey" -> integral, "n_name" -> text,
                      "n_regionkey" -> integral),
    "customer" -> Seq("c_custkey" -> integral, "c_name" -> text,
                      "c_nationkey" -> integral, "c_acctbal" -> fractional,
                      "c_mktsegment" -> text),
    "supplier" -> Seq("s_suppkey" -> integral, "s_name" -> text,
                      "s_nationkey" -> integral, "s_acctbal" -> fractional),
    "part"     -> Seq("p_partkey" -> integral, "p_name" -> text,
                      "p_brand" -> text, "p_type" -> text,
                      "p_size" -> integral, "p_retailprice" -> fractional),
    "orders"   -> Seq("o_orderkey" -> integral, "o_custkey" -> integral,
                      "o_orderstatus" -> text, "o_totalprice" -> fractional,
                      "o_orderdate" -> temporal, "o_orderpriority" -> text),
    "lineitem" -> Seq("l_orderkey" -> integral, "l_partkey" -> integral,
                      "l_suppkey" -> integral, "l_linenumber" -> integral,
                      "l_quantity" -> fractional, "l_extendedprice" -> fractional,
                      "l_discount" -> fractional, "l_tax" -> fractional,
                      "l_returnflag" -> text, "l_linestatus" -> text,
                      "l_shipdate" -> temporal),
    "events"   -> Seq("event_id" -> integral, "ts" -> eventTs,
                      "user_id" -> integral, "event_type" -> text,
                      "value" -> fractional, "props" -> text),
    "documents" -> Seq("doc_id" -> integral, "text" -> text,
                       "lang" -> text, "source" -> text, "n_chars" -> integral),
    "embeddings" -> Seq("vec_id" -> integral, "embedding" -> floatArray,
                        "label" -> integral))

  /** Fail fast with a message naming the table and every violation, so a
    * future testdata regeneration surfaces as one readable error at load
    * time instead of a mid-plan AnalysisException deep in a query. */
  private def assertSchema(name: String, df: DataFrame): DataFrame = {
    expectedSchemas.get(name).foreach { cols =>
      val found = df.schema.map(f => f.name -> f.dataType).toMap
      val problems = cols.flatMap { case (c, (family, ok)) =>
        found.get(c) match {
          case None => Some(s"missing column `$c` (expected $family); found columns: " +
            df.schema.fieldNames.mkString(", "))
          case Some(dt) if !ok(dt) => Some(s"column `$c`: expected $family, found $dt")
          case _ => None
        }
      }
      if (problems.nonEmpty) throw new IllegalArgumentException(
        s"table `$name`: unexpected schema — ${problems.mkString("; ")}")
    }
    df
  }

  /** Read a testdata table; small tables are cached on first touch. The
    * cache() is idempotent (Spark's CacheManager dedups by canonicalized
    * plan) and plays the buffer-pool role DuckDB gets from the OS page
    * cache when Verify/Bench run ~114 queries over the same ten tables in
    * one session. The size gate keeps the policy honest at scale: only
    * tables under [[cacheMaxBytes]] on disk are pinned; anything larger
    * streams from the source and relies on locality + shuffle reuse.
    * The operators themselves never depend on the data being resident. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val df = assertSchema(name, spark.read.parquet(path))
    // kill-switch: -Dgraft.no.cache=1 (PlanAudit uses it so parquet-scan
    // pushdown is visible instead of InMemoryTableScan pushdown)
    if (!sys.props.contains("graft.no.cache") && onDiskBytes(path) <= cacheMaxBytes)
      df.cache()
    df
  }

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** events.ts has shipped as two different parquet physical types across
    * testdata generations, so the loader adapts to the observed schema
    * instead of assuming one:
    *   - TIMESTAMP(NANOS): Spark's TimestampType (µs) refuses it outright,
    *     so the legacy flag reads it as a raw nanos LongType and we
    *     truncate to µs. Integer `div` keeps full precision (ns epoch
    *     values exceed 2^53, so double division would corrupt them).
    *   - timestamp[us] without tz: Spark 4.x reads it as TIMESTAMP_NTZ;
    *     cast to TimestampType — under the UTC session this is a pure
    *     relabel of the same instant, so window/session_window and the
    *     DuckDB oracle (which reads the same column as naive TIMESTAMP)
    *     agree.
    *   - timestamp[us] adjusted to UTC: already TimestampType, use as-is.
    * All event queries emit second-granularity timestamps, where µs-Spark
    * and ns-DuckDB agree.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(t(s, d, "events"))
  }

  /** The ONE ts-normalization shared by the batch loader and the
    * streaming source (EventStream.source) so the two can't drift:
    * whatever generation of events parquet arrived, the output `ts` is
    * a µs TimestampType. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // The NTZ→TimestampType cast is an instant-preserving RELABEL only
        // under a UTC session timezone; every in-repo entry point sets it,
        // but a future caller with a misconfigured session must fail
        // loudly here rather than silently shift every event instant
        // (ADVICE r11). The LongType/TimestampType branches are
        // timezone-free (epoch micros / already-zoned) and stay ungated.
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "")
        require(tz == "UTC",
          s"events.ts normalization: TIMESTAMP_NTZ relabel requires " +
            s"spark.sql.session.timeZone=UTC, found '$tz' — a non-UTC cast " +
            "would shift every event instant")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalArgumentException(
        s"events.ts: expected LongType (nanos), TimestampNTZType or TimestampType, found $other")
    }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  // ---- determinism helpers (Spark side) -------------------------------
  /** Exact decimal image of a ~2-dp money double (windowed sums only —
    * grouped sums use the faster fixed-point LongType path below). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))
  /** Exact decimal image of a product of ≤3 clean-decimal doubles: the true
    * value has ≤6 decimal places, so rounding the double product to 6 dp
    * recovers it exactly on both engines. */
  def dec6(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Exact fixed-point long image of a ~2-dp money double (cents). The
    * true value has ≤2 dp, so the IEEE double sits within ~1e-9 of the
    * cent grid — far from any .5 tie — and FLOOR(x+0.5) recovers it
    * exactly on both engines (both evaluate the identical IEEE
    * expression). floor is used instead of round because Spark's Round
    * on doubles routes through BigDecimal per value, while floor is a
    * single Math.floor in codegen and already yields LongType. */
  def cents(c: Column): Column = floor(c * lit(100) + lit(0.5))
  private def micros(c: Column): Column = floor(c * lit(1000000) + lit(0.5))

  /** Order-independent SUM(double): exact fixed-point LongType
    * accumulation. Long sums are an order of magnitude faster than the
    * DecimalType(18,4) accumulator this replaces (decimal add is a
    * non-primitive branchy path even in codegen; long add is a single
    * ALU op in the hash-agg fast row) and equally order-independent —
    * integer addition is associative. Overflow headroom: cents of a
    * ≤1e5-dollar value are ≤1e7/row, so a single group can absorb ~1e11
    * rows (≈ sf100k) before nearing 2^63. */
  def dsum(c: Column): Column = sum(cents(c)).cast("double") / lit(100.0)

  /** Order-independent SUM over 6-dp products (price*(1-disc)[*(1+tax)]).
    * Micro-units of a ~1e5 value are ~1e11/row — a single long
    * accumulator would overflow near 1e8 rows/group (real at 100 TB), so
    * the value splits into whole units and the ≤1e6 micro remainder,
    * each summed as longs (headroom ~1e12 rows/group), recombined in
    * double at the end. Both engines evaluate the identical expression
    * tree over exactly-represented integers, so results are
    * bit-identical; `%` is truncated (sign-of-dividend) remainder in
    * both Spark and DuckDB, and the unit quotient divides exactly so
    * floor-vs-truncate division cannot differ. */
  def dsum6(c: Column): Column = {
    val v  = micros(c)
    val lo = v % lit(1000000L)
    val hi = ((v - lo) / lit(1000000L)).cast("long")
    sum(hi).cast("double") + sum(lo).cast("double") / lit(1000000.0)
  }

  // ---- determinism helpers (oracle side, ANSI/DuckDB SQL) --------------
  /** SQL twin of [[dsum]]. */
  def oSum(e: String): String =
    s"(CAST(SUM(CAST(FLOOR(($e) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0)"
  /** SQL twin of [[dsum6]] (same hi/lo split; `//` sees an exact multiple
    * so floor and truncating division agree). */
  def oSum6(e: String): String = {
    val v = s"CAST(FLOOR(($e) * 1000000 + 0.5) AS BIGINT)"
    s"(CAST(SUM(($v - $v % 1000000) // 1000000) AS DOUBLE)" +
      s" + CAST(SUM($v % 1000000) AS DOUBLE) / 1000000.0)"
  }
  /** SQL twin of the fixed-point-exact average. */
  def oAvg(e: String): String = s"(${oSum(e)} / COUNT(*))"
}

/** A named operator query + its DuckDB oracle (None → driver runs the
  * weaker rows-only check; used for ops whose semantics are not
  * SQL-expressible, e.g. MinHash with Spark's murmur3). */
final case class OpQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object OpQuery {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): OpQuery =
    OpQuery(name, run, Some(oracle))
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): OpQuery =
    OpQuery(name, run, None)
}
