package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** md5-derived hash kernels (round 21). The dedup signature operators
  * derive their deterministic, engine-portable hashes from md5 via
  * `conv(substring(md5(x), a, b), 16, 10)` — which materializes a
  * 32-char hex STRING per digest, slices it, and re-parses the slice
  * back into a long (for MinHash, four slices per digest). The digest
  * itself is the portable part; the hex round-trip is pure overhead on
  * the hottest per-token/per-shingle path. These kernels read the
  * digest BYTES directly. Bit-identical to the composed forms by
  * construction (hex char i = nibble i of the digest; conv parses
  * big-endian unsigned) — pinned in PropertySpec against the composed
  * spellings; the DuckDB oracle twins keep their own SQL md5 chain.
  */
object HashExprs {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** first 60 bits of md5(s) as a long —
    * ≡ conv(substring(md5(s), 1, 15), 16, 10): hex chars 1..15 are
    * digest nibbles 0..14 = (first 8 bytes big-endian) >>> 4. */
  def md5Prefix60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  /** the four unsigned 32-bit big-endian chunks of md5(s) —
    * chunk j ≡ conv(substring(md5(s), j*8+1, 8), 16, 10). */
  def md5Chunks(s: UTF8String): ArrayData = {
    val d = md.get()
    d.reset()
    val b = d.digest(s.getBytes)
    val out = new Array[Long](4)
    var j = 0
    while (j < 4) {
      out(j) = ((b(4 * j) & 0xFFL) << 24) | ((b(4 * j + 1) & 0xFFL) << 16) |
        ((b(4 * j + 2) & 0xFFL) << 8) | (b(4 * j + 3) & 0xFFL)
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class Md5Prefix60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 expects STRING, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(s: Any): Any =
    HashExprs.md5Prefix60(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.HashExprs.md5Prefix60($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "md5_prefix60"
}

case class Md5Chunks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"md5_chunks expects STRING, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(s: Any): Any =
    HashExprs.md5Chunks(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.HashExprs.md5Chunks($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "md5_chunks"
}

object HashFns {
  /** first 60 bits of md5 as long (simhash signature hash). */
  def md5_prefix60(c: Column): Column =
    GraftShim.column(Md5Prefix60(GraftShim.expression(c)))
  /** md5 split into four unsigned 32-bit longs (minhash permutations). */
  def md5_chunks(c: Column): Column =
    GraftShim.column(Md5Chunks(GraftShim.expression(c)))
}
