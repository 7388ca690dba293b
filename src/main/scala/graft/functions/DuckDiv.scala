package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, IntegralDivide}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** DuckDB's `//` operator, measured on 1.0.0 (FUZZ_NOTES class #4 and
  * the shim scaladoc):
  *
  *  - INTEGER // INTEGER: TRUNCATING integer division (-5 // 2 = -2 —
  *    toward zero, not floor), divisor 0 → NULL;
  *  - any FLOAT operand: PLAIN division (its docs say floor; the engine
  *    measures -5.0 // 2 = -2.5 and 7.5 // 2 = 3.75), divisor 0 → NULL.
  *
  * The gateway shim rewrites `a // b` to `a div b` (operand extraction
  * is a token swap; wrapping arbitrary expressions in a call is not),
  * and [[DuckDivRule]] then replaces the analyzed [[IntegralDivide]]
  * with this TYPE-AWARE expression — the analyzer knows the operand
  * types the string-level shim cannot. This closes what was a
  * documented shim bound: float `//` previously surfaced Spark's div
  * type error.
  *
  * Deliberate session-semantics consequence, stated not hidden: Spark
  * 4's ANSI `div` THROWS on divisor 0; this engine's SQL surface is the
  * reference's DuckDB-compatible contract, so `div` (and therefore
  * `//`) returns NULL on 0, matching the measured engine. Long.MinValue
  * div -1 overflow keeps JVM wrap semantics (DuckDB widens to HUGEINT —
  * a 128-bit result no BIGINT surface can represent; documented bound).
  */
case class DuckDiv(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  private def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  private val bothIntegral = integral(left.dataType) && integral(right.dataType)

  override def dataType: DataType = if (bothIntegral) LongType else DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(left, right).forall(e => e.dataType.isInstanceOf[NumericType]))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"duck_div expects numeric operands, got ${left.dataType} // ${right.dataType}")

  private def toD(v: Any): Double = v match {
    case d: Decimal => d.toDouble
    case n: java.lang.Number => n.doubleValue()
  }
  private def toL(v: Any): Long = v match {
    case n: java.lang.Number => n.longValue()
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    if (bothIntegral) {
      val rv = toL(r)
      if (rv == 0L) null else toL(l) / rv
    } else {
      val rv = toD(r)
      if (rv == 0.0) null else toD(l) / rv
    }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DuckDiv =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "duck_div"
}

/** Resolution rule: every analyzed `div` ([[IntegralDivide]]) becomes
  * [[DuckDiv]]. Runs once per expression (the replacement is not an
  * IntegralDivide, so the fixed-point batch converges immediately). */
object DuckDivRule extends Rule[LogicalPlan] {
  def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        case d: IntegralDivide if d.left.resolved && d.right.resolved =>
          DuckDiv(d.left, d.right)
      }
    }
}
