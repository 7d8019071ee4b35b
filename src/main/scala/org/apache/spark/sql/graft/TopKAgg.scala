package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate over (score, id) pairs: keeps the k
  * highest-score entries per group (ties prefer the smaller id — the same
  * order as `row_number() over (order by score desc, id)`), returned as a
  * sorted array<struct<score:double, id:bigint>>.
  *
  * This is the declarative replacement for the window-rerank shape
  * (`row_number().over(Window.partitionBy("q_id").orderBy(...)) <= k`),
  * which must shuffle and sort EVERY scored candidate row. As a
  * [[TypedImperativeAggregate]] it participates in partial aggregation:
  * each map task reduces its candidates to at most k per group before the
  * exchange, so the shuffle moves |tasks|×|groups|×k bounded entries — the
  * same distributed-top-k shape as [[CosineTopKExec]], but composable with
  * any candidate-generation plan (LSH buckets, IVF cells, ...).
  */
case class ScoredTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression]
  with ExpectsInputTypes {

  require(k > 0, s"k=$k must be positive")

  override def left: Expression = score
  override def right: Expression = id

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKHeap, other: TopKHeap): TopKHeap = {
    other.toArray.foreach { case (s, i) => buffer.add(s, i) }
    buffer
  }

  override def eval(buffer: TopKHeap): Any =
    new GenericArrayData(buffer.toArray
      .sortBy { case (s, i) => (-s, i) }
      .map { case (s, i) => InternalRow(s, i) })

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val entries = buffer.toArray
    val bb = ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var j = 0
    while (j < n) { h.add(bb.getDouble, bb.getLong); j += 1 }
    h
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def prettyName: String = "scored_top_k"

  override def withNewMutableAggBufferOffset(newOffset: Int): ScoredTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ScoredTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScoredTopK =
    copy(score = newLeft, id = newRight)
}

object ScoredTopK {
  import org.apache.spark.sql.Column

  def apply(score: Column, id: Column, k: Int): Column =
    bridge.column(ScoredTopK(bridge.expression(score), bridge.expression(id), k)
      .toAggregateExpression())
}
