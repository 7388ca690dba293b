package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Membership probe against a pre-built bit array (the bloom screen's
  * probe side). The words array rides along as a codegen REFERENCE
  * OBJECT (`ctx.addReferenceObj`), not a plan literal: a literal array
  * is re-parsed into every generated class and bloats the plan string,
  * which is why the pre-round-16 bloom screen had to cap its filter at
  * 2^22 bits. A reference object is serialized once into the stage's
  * task binary (broadcast to each executor once), so the filter can
  * grow with the holdout — 2^27 bits is a 16 MiB long[], negligible
  * against a 100 TB probe side — while the probe itself stays a pure
  * codegen word-index + mask test inside WholeStageCodegen.
  *
  * The position child must already be reduced modulo the bit width
  * (64 × words.length); out-of-range positions would throw, which is
  * the correct loud failure for a mis-derived modulus.
  */
case class BitSetContains(child: Expression, words: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bitset_contains"

  // the raw long[] would print as [J@hex inside plan strings (and the
  // default case-class toString walks every field); keep the plan text
  // stable and informative instead
  override def toString: String =
    s"bitset_contains($child, ${words.length} words)"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitset_contains expects a BIGINT position, got ${child.dataType.simpleString}")

  override def nullSafeEval(p: Any): Any = {
    val pos = p.asInstanceOf[Long]
    (words((pos >>> 6).toInt) & (1L << (pos & 63L).toInt)) != 0L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bitsetWords", words, "long[]")
    defineCodeGen(ctx, ev, p =>
      s"($ref[(int) ($p >>> 6)] & (1L << (int) ($p & 63L))) != 0L")
  }

  override protected def withNewChildInternal(newChild: Expression): BitSetContains =
    copy(child = newChild)
}

object BitSetExprs {
  /** Boolean column: is the bit at position `pos` (a BIGINT column,
    * already reduced modulo 64 × words.length) set in `words`? */
  def bitsetContains(pos: Column, words: Array[Long]): Column =
    GraftShim.column(BitSetContains(GraftShim.expression(pos), words))
}
