package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

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

  /** Integer dot of two long vectors — the quantized-candidate kernel
    * (q131's SQ8 codes are bounded by ±127, so the sum is ≤ Dim·127²
    * ≪ 2⁶³: plain long MACs, exact, no overflow handling needed).
    */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** Reference implementation: literal BigDecimal per element. Semantics
    * anchor for [[dotDecimal]] (PropertySpec asserts bit-equality) and the
    * exact fallback when a product's magnitude leaves the long-arithmetic
    * fast window (|p| with fewer significant digits than its exponent —
    * impossible for unit-norm embedding components, cheap to re-run when
    * it does happen).
    */
  def dotDecimalRef(a: ArrayData, b: ArrayData): Double = {
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

  private val POW10: Array[Long] = {
    val a = new Array[Long](19)
    a(0) = 1L
    var i = 1
    while (i < 19) { a(i) = a(i - 1) * 10L; i += 1 }
    a
  }

  /** Same value as [[dotDecimalRef]], bit for bit, with the BigDecimal
    * machinery hoisted out of the inner loop: each product's shortest
    * round-trip repr (≤ 17 significant digits — always fits a long) is
    * parsed straight into (digits, pow10), scaled to its unscaled value
    * at scale 18 with HALF_UP in 64/128-bit integer arithmetic, and
    * accumulated exactly in a two-long signed 128-bit sum. One decimal
    * conversion per DOT instead of three BigDecimal allocations per
    * ELEMENT — this loop is the warm-phase hot spot at 100× scale
    * (all 32 executor threads measured pinned in the BigDecimal variant).
    */
  def dotDecimal(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var accHi = 0L
    var accLo = 0L
    var i = 0
    while (i < n) {
      val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
      if (!java.lang.Double.isFinite(p)) return dotDecimalRef(a, b)
      if (p != 0.0) {
        // Double.toString: [-]d.d…d or [-]d.d…dE[-]dd, ≥ 1 fractional digit.
        val s = java.lang.Double.toString(p)
        val len = s.length
        var k = 0
        var neg = false
        if (s.charAt(0) == '-') { neg = true; k = 1 }
        var digits = 0L
        var frac = 0
        var exp = 0
        var inFrac = false
        while (k < len) {
          val c = s.charAt(k)
          if (c == '.') inFrac = true
          else if (c == 'E') { exp = java.lang.Integer.parseInt(s.substring(k + 1)); k = len }
          else { digits = digits * 10L + (c - '0'); if (inFrac) frac += 1 }
          k += 1
        }
        // unscaled-at-18 contribution = digits * 10^(exp - frac + 18)
        val m = exp - frac + 18
        if (m > 18) return dotDecimalRef(a, b)
        var hi = 0L
        var lo = 0L
        if (m >= 0) {
          val f = POW10(m)
          hi = Math.multiplyHigh(digits, f) // ≤ 1e17 · 1e18 < 2^127, both positive
          lo = digits * f
        } else {
          val d = -m
          if (d <= 17) { // d ≥ 18 ⇒ digits < 5·10^(d-1) always ⇒ rounds to zero
            val div = POW10(d)
            var q = digits / div
            val r = digits % div
            if (r >= div - r) q += 1 // HALF_UP away from zero on the magnitude
            lo = q
          }
        }
        if (neg) { // two's-complement negate (hi, lo)
          hi = ~hi
          lo = ~lo + 1L
          if (lo == 0L) hi += 1L
        }
        val sumLo = accLo + lo
        val carry = if (java.lang.Long.compareUnsigned(sumLo, accLo) < 0) 1L else 0L
        accHi = accHi + hi + carry
        accLo = sumLo
      }
      i += 1
    }
    if (accHi == (accLo >> 63)) {
      JBigDecimal.valueOf(accLo, 18).doubleValue()
    } else {
      val bytes = new Array[Byte](16)
      var v = accHi
      var j = 7
      while (j >= 0) { bytes(j) = (v & 0xffL).toByte; v >>>= 8; j -= 1 }
      v = accLo
      j = 15
      while (j >= 8) { bytes(j) = (v & 0xffL).toByte; v >>>= 8; j -= 1 }
      new JBigDecimal(new java.math.BigInteger(bytes), 18).doubleValue()
    }
  }
}

case class VectorDotDecimal(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // Declared input types: mistyped SQL calls fail at analysis with a clean
  // type error instead of a runtime ClassCastException inside codegen.
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
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

case class VectorDotLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_dot_long"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorDotImpl.dotLong(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorDotImpl.dotLong($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): VectorDotLong =
    copy(left = newLeft, right = newRight)
}

case class VectorDotDouble(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
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
