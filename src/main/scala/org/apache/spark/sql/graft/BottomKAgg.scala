package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded buffer for [[BottomKLongs]]: the k smallest DISTINCT longs seen
  * so far, kept in a TreeSet (≤ k entries — insertion is O(log k), a value
  * ≥ the current max of a full buffer is rejected in O(log k)). */
final class BottomKSet(val k: Int) {
  private val s = new java.util.TreeSet[java.lang.Long]()
  def add(v: Long): Unit = {
    if (s.size < k) { s.add(v); () }
    else if (v < s.last()) { if (s.add(v)) { s.pollLast(); () } }
  }
  def toArray: Array[Long] = {
    val out = new Array[Long](s.size)
    val it = s.iterator(); var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }
}

/** Bottom-k DISTINCT aggregate over a long column: the k smallest distinct
  * values per group, as a sorted ascending array<bigint>.
  *
  * This is the KMV sketch's build kernel ([[graft.ops.Sketches.kmvSketch]])
  * as a [[TypedImperativeAggregate]] instead of the distinct + window
  * `row_number()` shape: it partial-aggregates map-side, so the exchange
  * carries |tasks|×|groups|×k longs instead of every distinct hash in the
  * corpus, and no per-group sort task materializes the full distinct set.
  * The same property is what makes it STREAMABLE: the buffer is ≤ k longs
  * per group for any stream lifetime and merges across micro-batches by
  * set-union-then-trim — a complete-mode streaming aggregation holds
  * groups×k state where exact distinct collection would hold every key
  * ever seen.
  */
case class BottomKLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKSet] with UnaryLike[Expression]
  with ExpectsInputTypes {

  require(k > 0, s"k=$k must be positive")

  override def createAggregationBuffer(): BottomKSet = new BottomKSet(k)

  override def update(buffer: BottomKSet, input: InternalRow): BottomKSet = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: BottomKSet, other: BottomKSet): BottomKSet = {
    other.toArray.foreach(buffer.add)
    buffer
  }

  override def eval(buffer: BottomKSet): Any =
    new GenericArrayData(buffer.toArray)

  override def serialize(buffer: BottomKSet): Array[Byte] = {
    val entries = buffer.toArray
    val bb = ByteBuffer.allocate(4 + entries.length * 8)
    bb.putInt(entries.length)
    entries.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKSet = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new BottomKSet(k)
    var j = 0
    while (j < n) { s.add(bb.getLong); j += 1 }
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def prettyName: String = "bottom_k_longs"

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomKLongs =
    copy(child = newChild)
}

object BottomKLongs {
  import org.apache.spark.sql.Column

  def apply(value: Column, k: Int): Column =
    bridge.column(BottomKLongs(bridge.expression(value), k)
      .toAggregateExpression())
}
