package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Decimal-exact dot product of two float vectors, replicating EXACTLY the
  * semantics of the declarative fold in operators.VectorOps:
  * per-element double product → cast DECIMAL(38,18) (Spark casts HALF_UP) →
  * exact decimal sum → double. Order-independent, so Spark and the DuckDB
  * oracle agree bitwise; as a native expression the whole loop runs inside
  * whole-stage codegen instead of interpreted per-element lambda eval
  * (the HOF fold allocates an evaluation context per element per row).
  */
object VectorDotImpl {

  /** Plain-double dot product — the production path for similarity search
    * (one codegen'd loop, no decimal boxing). Use [[dotDecimal]] only where
    * a cross-engine oracle must reproduce the sum bit-for-bit regardless
    * of aggregation order.
    */
  def dotDouble(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def dotDecimal(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
      // Spark's double→decimal cast parses Double.toString (shortest
      // round-trip repr), NOT the exact binary expansion — match it.
      acc = acc.add(new JBigDecimal(java.lang.Double.toString(p))
        .setScale(18, RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue()
  }
}

case class VectorDotDecimal(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot_decimal"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorDotImpl.dotDecimal(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorDotImpl.dotDecimal($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): VectorDotDecimal =
    copy(left = newLeft, right = newRight)
}

case class VectorDotDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorDotImpl.dotDouble(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorDotImpl.dotDouble($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): VectorDotDouble =
    copy(left = newLeft, right = newRight)
}
