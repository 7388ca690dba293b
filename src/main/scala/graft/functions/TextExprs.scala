package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass Unicode script-class counter (round 13).
  *
  * `script_counts(text)` → array<bigint> of
  * `[codepoints, latin_letters, digits, cjk_ideographs, spaces]`.
  *
  * Why an Expression: the SQL formulation of the script profile runs
  * FOUR `regexp_replace` deletion passes plus `length` per class — the
  * 64× ladder measured the operator exactly LINEAR and regex-bound
  * (43.7 s at 64×, ~all of it regex engine time). One codepoint walk
  * computes all four counts; the codegen path is a single static call,
  * so the projection stays inside whole-stage codegen. Class
  * definitions match the SQL/regex classes exactly ([A-Za-z], [0-9],
  * [一-鿿], ' ') so the DuckDB oracle is unchanged.
  */
case class ScriptCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"script_counts expects a STRING input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ScriptCounts.count(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.ScriptCounts.count($c))")

  override protected def withNewChildInternal(newChild: Expression): ScriptCounts =
    copy(child = newChild)
  override def prettyName: String = "script_counts"
}

object ScriptCounts {
  /** Single codepoint walk; the static target of the codegen call. */
  def count(s: UTF8String): Array[Long] = {
    val str = s.toString
    var n = 0L; var latin = 0L; var digit = 0L; var cjk = 0L; var space = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      n += 1
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) latin += 1
      else if (cp >= '0' && cp <= '9') digit += 1
      else if (cp >= 0x4e00 && cp <= 0x9fff) cjk += 1
      else if (cp == ' ') space += 1
      i += Character.charCount(cp)
    }
    Array(n, latin, digit, cjk, space)
  }
}

object TextExprs {
  /** `[codepoints, latin, digits, cjk, spaces]` of a string column. */
  def scriptCounts(c: Column): Column =
    GraftShim.column(ScriptCounts(GraftShim.expression(c)))
}
