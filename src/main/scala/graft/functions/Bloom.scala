package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Broadcastable Bloom filter over 64-bit key hashes — the standard
  * semi-join accelerator when the filter side is too large to broadcast
  * raw but its SET MEMBERSHIP fits in a few hundred KB of bits. Built
  * distributed (map-side partial bitsets, OR-merge, one binary row out),
  * probed by a codegen'd expression, so a 100 TB scan drops non-members
  * before any shuffle; exact verification downstream removes the false
  * positives, keeping end-to-end semantics exact (a Bloom filter has no
  * false NEGATIVES, so nothing true is lost).
  *
  * Layout: 4 bytes big-endian k (hash count), then the bit array packed
  * in bytes. Bit positions come from k splitmix64-mixed variants of the
  * key — deterministic everywhere, no RNG state.
  */
object BloomImpl {

  private final val Golden = 0x9E3779B97F4A7C15L

  /** splitmix64 finalizer — full-avalanche mix of a 64-bit value. */
  def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Set the k bit positions for `key` in a long-word bitset. */
  def set(words: Array[Long], numBits: Int, k: Int, key: Long): Unit = {
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(mix(key + i * Golden), numBits.toLong).toInt
      words(pos >>> 6) |= (1L << (pos & 63))
      i += 1
    }
  }

  /** Serialize k + bitset words to the probe-side byte layout. */
  def toBytes(words: Array[Long], k: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + words.length * 8)
    out.putInt(k)
    words.foreach(out.putLong)
    out.array()
  }

  /** Probe the serialized filter; true = key MIGHT be a member. */
  def mightContain(filter: Array[Byte], key: Long): Boolean = {
    val k = ((filter(0) & 0xFF) << 24) | ((filter(1) & 0xFF) << 16) |
      ((filter(2) & 0xFF) << 8) | (filter(3) & 0xFF)
    val numBits = (filter.length - 4) * 8
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(mix(key + i * Golden), numBits.toLong).toInt
      // Bytes hold words big-endian: bit b of word w is byte 4 + 8w + (7 - b/8).
      val word = pos >>> 6
      val bit = pos & 63
      val byte = filter(4 + word * 8 + (7 - (bit >>> 3)))
      if ((byte & (1 << (bit & 7))) == 0) return false
      i += 1
    }
    true
  }
}

/** Distributed Bloom build: one binary row out, OR-merged map-side partials
  * (each partition touches only its own bitset copy — no shuffle of keys).
  */
case class BloomBuildAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64: $numBits")
  require(numHashes > 0 && numHashes <= 16, s"numHashes out of range: $numHashes")

  // Misuse fails at analysis time (like BloomMightContain), not as a
  // ClassCastException inside update() mid-job.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_build requires a BIGINT key, got ${child.dataType.catalogString}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomImpl.set(buf, numBits, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomImpl.toBytes(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] = BloomImpl.toBytes(buf, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.getInt() // k — constant per instance
    val words = new Array[Long]((bytes.length - 4) / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    words
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "bloom_build"
}

/** Codegen'd membership probe — stays inside whole-stage codegen so the
  * prefilter costs k mixes per row, applied at the scan before any join.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (binary, bigint), got (${left.dataType}, ${right.dataType})")
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(f: Any, key: Any): Any =
    BloomImpl.mightContain(f.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, k) => s"graft.functions.BloomImpl.mightContain($f, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
