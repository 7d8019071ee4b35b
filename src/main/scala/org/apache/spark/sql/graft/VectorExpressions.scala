package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native codegen dot product over two array<float> columns, accumulated in
  * double with a deterministic left-to-right loop.
  *
  * Why a custom Expression: the composable alternative
  * (`aggregate(zip_with(a,b,_*_),0d,_+_)`) runs on Catalyst's *interpreted*
  * higher-order-function path and allocates an intermediate array per row —
  * ~50× slower on the all-pairs similarity workloads. This compiles into the
  * surrounding whole-stage-codegen'd operator as a tight primitive loop.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: this expression may appear several times in one
      // whole-stage-codegen function, so fixed locals would collide
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Dot product of two array<float> columns (codegen). */
  def dotF(a: Column, b: Column): Column =
    bridge.column(FloatVecDot(bridge.expression(a), bridge.expression(b)))

  /** Cosine similarity via the codegen dot kernel. */
  def cosineF(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dotF(a, b) / sqrt(dotF(a, a)) / sqrt(dotF(b, b))
  }
}
