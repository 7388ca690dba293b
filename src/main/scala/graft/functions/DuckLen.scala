package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DuckDB's `len(x)` — ubiquitous in DuckDB SQL and absent from Spark,
  * so the gateway registers it directly (the acceptance-gap twin of
  * [[DuckDiv]]): CHARACTER count for strings (measured: len('héllo') =
  * 5, len('王红ab') = 4), byte count for blobs, element count for
  * lists, BIGINT result, NULL → NULL. A string-level rename cannot do
  * this — the target function differs by operand TYPE (length vs
  * array_size), which only the analyzer knows. `array_length(l)` is
  * the same measurement for lists and registers to the same
  * expression. */
case class DuckLen(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType | _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"len expects a string, binary or array operand, got $other")
  }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => v.asInstanceOf[UTF8String].numChars().toLong
    case BinaryType => v.asInstanceOf[Array[Byte]].length.toLong
    case _: ArrayType => v.asInstanceOf[ArrayData].numElements().toLong
    case other => throw new IllegalStateException(s"len over $other")
  }

  override protected def withNewChildInternal(newChild: Expression): DuckLen =
    copy(child = newChild)

  override def prettyName: String = "len"
}
