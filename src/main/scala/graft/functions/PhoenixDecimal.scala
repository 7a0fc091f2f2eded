package graft.functions

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Phoenix DECIMAL division semantics (reference:
  * .../expression/DecimalDivideExpression.java + DivideExpression.java:62-78
  * + util/NumberUtil.setDecimalWidthAndScale):
  *
  *  - the quotient is computed at MathContext(38, HALF_UP);
  *  - result scale = max(38 - lp + ls - rs, 0), precision = scale + lp -
  *    ls + rp, both capped at 38 (lp/ls = left precision/scale, …);
  *  - the value is truncated (ROUND_DOWN) to the result scale, and if its
  *    integer digits don't fit the derived width Phoenix raises
  *    DataExceedsCapacityException.
  *
  * This deliberately DIFFERS from both Spark (which reduces scale with
  * precision-loss allowed) and DuckDB (which promotes wide decimal
  * division to DOUBLE) — hence no SQL oracle; semantics are pinned in
  * FunctionsSpec against values computed by the reference's rules.
  */
case class PhoenixDecimalDivide(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  private val MaxPrecision = 38
  private val Ctx = new MathContext(MaxPrecision, RoundingMode.HALF_UP)

  private def in(e: Expression): (Int, Int) = e.dataType match {
    case d: DecimalType => (d.precision, d.scale)
    case other => throw new IllegalArgumentException(
      s"phoenix_decimal_div needs DECIMAL inputs, got $other")
  }

  /** (precision, scale) per DivideExpression.getPrecision/getScale. */
  private lazy val resultPS: (Int, Int) = {
    val (lp, ls) = in(left)
    val (rp, rs) = in(right)
    val scale = math.min(MaxPrecision, math.max(MaxPrecision - lp + ls - rs, 0))
    val prec = math.min(MaxPrecision, scale + lp - ls + rp)
    (prec, scale)
  }

  override def dataType: DataType =
    DecimalType(resultPS._1, resultPS._2)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val l = a.asInstanceOf[Decimal].toJavaBigDecimal
    val r = b.asInstanceOf[Decimal].toJavaBigDecimal
    if (r.signum() == 0) throw new ArithmeticException("divide by zero")
    var q: JBigDecimal = l.divide(r, Ctx)
    val (prec, scale) = resultPS
    // NumberUtil.setDecimalWidthAndScale: truncate to scale; error when
    // the integer digits exceed the derived width
    if (prec - scale < q.precision() - q.scale())
      throw new ArithmeticException(
        s"value $q exceeds DECIMAL($prec,$scale) (reference " +
          "DataExceedsCapacityException)")
    q = q.setScale(scale, RoundingMode.DOWN)
    Decimal(q, prec, scale)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PhoenixDecimalDivide =
    copy(left = l, right = r)
  override def prettyName: String = "phoenix_decimal_div"
}
