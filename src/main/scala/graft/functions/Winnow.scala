package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03):
  * hash every k-char gram of the text with the corpus polynomial family
  * (base 131 mod 1e9+7 — TextOps.fingerprint's arithmetic), slide a
  * window of w consecutive gram hashes, and keep each window's minimal
  * (hash, pos) pair. GUARANTEE: every substring shared between two
  * documents of length ≥ w + k − 1 contributes at least one identical
  * selected fingerprint to both, and no match shorter than k is ever
  * produced — the detection floor MinHash/SimHash similarity cannot give.
  * Expected fingerprint density is 2/(w+1) per character, so the index
  * is linear in corpus size with a small constant.
  *
  * Output: sorted distinct packed keys `hash·2³³ + pos` (pos 1-based,
  * char-indexed; hash < 2³⁰ and pos < 2³³ keep the product under 2⁶³ for
  * documents up to ~8 G chars). Packing keeps the per-document
  * fingerprint array a primitive long array through the explode + join,
  * and makes the (hash, pos)-lexicographic window minimum one integer
  * comparison. One O(len) pass: rolling hash + monotonic deque.
  *
  * Character-code arithmetic matches the DuckDB oracle's `ascii()` for
  * the ASCII corpus (both engines hash the same integer sequence);
  * non-BMP input would diverge on surrogate pairs — documented corpus
  * assumption, same as TextOps.fingerprint.
  */
object WinnowImpl {
  val Mod: Long = 1000000007L
  val Base: Long = 131L
  val PosShift: Long = 1L << 33

  def winnowKeys(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    val m = n - k + 1
    if (m <= 0) return ArrayData.toArrayData(Array.empty[Long])
    // Rolling gram hashes: h_i = Σ c_j · B^(k-1-j) mod M.
    val keys = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * Base + str.charAt(i)) % Mod; i += 1 }
    keys(0) = h * PosShift + 1L
    var pk = 1L // B^(k-1) mod M
    i = 1
    while (i < k) { pk = pk * Base % Mod; i += 1 }
    i = 1
    while (i < m) {
      h = ((h - str.charAt(i - 1) * pk % Mod + Mod) * Base +
        str.charAt(i + k - 1)) % Mod
      keys(i) = h * PosShift + (i + 1L)
      i += 1
    }
    // Monotonic deque over windows of w keys (single window if m < w):
    // front always holds the window minimum; ties are impossible (pos is
    // unique within a doc), so min key = lexicographic min (hash, pos).
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (m <= w) {
      var best = keys(0)
      i = 1
      while (i < m) { if (keys(i) < best) best = keys(i); i += 1 }
      selected.add(best)
    } else {
      val deque = new Array[Int](m)
      var head = 0
      var tail = 0 // [head, tail) holds indices with increasing keys
      i = 0
      while (i < m) {
        while (tail > head && keys(deque(tail - 1)) > keys(i)) tail -= 1
        deque(tail) = i
        tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) selected.add(keys(deque(head)))
        i += 1
      }
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    ArrayData.toArrayData(out)
  }
}

case class WinnowKeys(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  // Declared input type: a mistyped call (winnow_keys(doc_id, ...)) fails
  // at ANALYSIS with a clean error instead of a ClassCastException inside
  // generated code.
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_keys"

  override protected def nullSafeEval(input: Any): Any =
    WinnowImpl.winnowKeys(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowImpl.winnowKeys($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowKeys =
    copy(child = newChild)
}
