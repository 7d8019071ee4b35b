package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable buffer for [[RegMaxInts]]: the element-wise running max.
  * Width is fixed by the FIRST array seen (null until then); a
  * mismatched width is a caller bug and raises loudly. */
final class RegMaxBuf(var regs: Array[Int])

/** Element-wise MAX over `array<int>` rows — the register-union
  * semilattice every HLL-family sketch merges by (q128's per-register
  * max, HyperANF's ball union, any fixed-width monotone counter array).
  *
  * Why a native aggregate instead of 2^p separate `max(element_at(...))`
  * expressions (the shape this replaced): one aggregate expression and
  * one buffer regardless of register count, so the plan and codegen
  * stay constant-size as p grows (p = 8 would otherwise plan 256
  * aggregate expressions), the update is a tight int-array loop, and it
  * partial-aggregates map-side (ObjectHashAggregate), shuffling one
  * 2^p-int array per (task, group). Mergeable across partitions and
  * micro-batches by the same element-wise max, so it is streamable
  * under the q131 complete-mode contract. */
case class RegMaxInts(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[RegMaxBuf] with UnaryLike[Expression]
  with ExpectsInputTypes {

  override def createAggregationBuffer(): RegMaxBuf = new RegMaxBuf(null)

  private def fold(buffer: RegMaxBuf, v: ArrayData): Unit = {
    val n = v.numElements()
    if (buffer.regs == null) buffer.regs = new Array[Int](n)
    require(buffer.regs.length == n,
      s"reg_max: register width changed mid-group (${buffer.regs.length} vs $n)")
    var j = 0
    while (j < n) {
      // loud like the width check: inputTypes declares containsNull=false
      // but Spark's type check ignores nullability, so a null element would
      // otherwise read as 0 silently
      require(!v.isNullAt(j), s"reg_max: null register element at index $j")
      val x = v.getInt(j)
      if (x > buffer.regs(j)) buffer.regs(j) = x
      j += 1
    }
  }

  override def update(buffer: RegMaxBuf, input: InternalRow): RegMaxBuf = {
    val v = child.eval(input)
    if (v != null) fold(buffer, v.asInstanceOf[ArrayData])
    buffer
  }

  override def merge(buffer: RegMaxBuf, other: RegMaxBuf): RegMaxBuf = {
    if (other.regs != null) {
      if (buffer.regs == null) buffer.regs = other.regs.clone()
      else {
        require(buffer.regs.length == other.regs.length,
          s"reg_max: register width changed mid-group (${buffer.regs.length} vs ${other.regs.length})")
        var j = 0
        while (j < other.regs.length) {
          if (other.regs(j) > buffer.regs(j)) buffer.regs(j) = other.regs(j)
          j += 1
        }
      }
    }
    buffer
  }

  override def eval(buffer: RegMaxBuf): Any =
    if (buffer.regs == null) null else new GenericArrayData(buffer.regs)

  override def serialize(buffer: RegMaxBuf): Array[Byte] = {
    val regs = if (buffer.regs == null) Array.empty[Int] else buffer.regs
    val bb = ByteBuffer.allocate(4 + regs.length * 4)
    bb.putInt(if (buffer.regs == null) -1 else regs.length)
    regs.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): RegMaxBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    if (n < 0) new RegMaxBuf(null)
    else {
      val regs = new Array[Int](n)
      var j = 0
      while (j < n) { regs(j) = bb.getInt; j += 1 }
      new RegMaxBuf(regs)
    }
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType, containsNull = false))
  override def prettyName: String = "reg_max"

  override def withNewMutableAggBufferOffset(newOffset: Int): RegMaxInts =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): RegMaxInts =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): RegMaxInts =
    copy(child = newChild)
}

object RegMaxInts {
  import org.apache.spark.sql.Column

  def apply(regs: Column): Column =
    bridge.column(RegMaxInts(bridge.expression(regs)).toAggregateExpression())
}
