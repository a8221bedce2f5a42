package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Top-k (score desc, id asc) as a TypedImperativeAggregate: keeps a k-sized
  * buffer per group with map-side partial aggregation, so ranking n
  * candidates costs O(n·k) bounded memory instead of a per-group sort of
  * all n (the window-function formulation materializes and sorts every
  * candidate per group — the difference matters when n/group is large).
  *
  * Returns array<struct<score double, id bigint>> sorted score desc, id asc
  * (deterministic under ties).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  require(k > 0, s"topk_by_score requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))))

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] = ArrayBuffer.empty

  private def insert(buf: ArrayBuffer[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.size < k) buf += e
    else {
      // replace the current worst if the new element beats it
      var worst = 0
      var i = 1
      while (i < buf.size) { if (better(buf(worst), buf(i))) worst = i; i += 1 }
      if (better(e, buf(worst))) buf(worst) = e
    }
  }

  override def update(buf: ArrayBuffer[(Double, Long)], input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) insert(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)], other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val sorted = buf.sortWith(better)
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[(Double, Long)]
    (1 to n).foreach(_ => buf += ((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topk_by_score"
}
