package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, LongType}

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

/** Random-hyperplane LSH signature: bit i of the result = sign of the dot
  * product with plane i. One native pass over the vector per row (the
  * composable `aggregate(zip_with(...))` per plane runs nPlanes interpreted
  * folds with per-row array allocations). `planes` is row-major
  * (nPlanes × dim), attached to the codegen class as a reference object.
  */
case class HyperplaneSig(child: Expression, planes: Array[Double], dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val nPlanes = planes.length / dim
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      var d = 0.0
      var i = 0
      val off = p * dim
      while (i < n) { d += v.getFloat(i).toDouble * planes(off + i); i += 1 }
      if (d > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val (n, sig, p, d, i, off) = (ctx.freshName("n"), ctx.freshName("sig"),
        ctx.freshName("p"), ctx.freshName("d"), ctx.freshName("i"), ctx.freshName("off"))
      s"""
         |int $n = java.lang.Math.min($c.numElements(), $dim);
         |int nPlanes_$sig = $pRef.length / $dim;
         |long $sig = 0L;
         |for (int $p = 0; $p < nPlanes_$sig; $p++) {
         |  double $d = 0.0;
         |  int $off = $p * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $d += (double) $c.getFloat($i) * $pRef[$off + $i];
         |  }
         |  if ($d > 0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Index of the centroid with the highest dot product against the input
  * vector (= nearest by cosine when centroids are pre-normalized, as the
  * IVF trainer guarantees). One native pass per row over all k centroids;
  * ties break to the lowest index (strict >), deterministically.
  * `centroids` is row-major (k × dim), attached as a codegen reference
  * object like [[HyperplaneSig]]'s planes.
  */
case class NearestCentroid(child: Expression, centroids: Array[Double], dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val k = centroids.length / dim
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var d = 0.0
      var i = 0
      val off = c * dim
      while (i < n) { d += v.getFloat(i).toDouble * centroids(off + i); i += 1 }
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val (n, k, best, bestDot, c, d, i, off) = (ctx.freshName("n"),
        ctx.freshName("k"), ctx.freshName("best"), ctx.freshName("bestDot"),
        ctx.freshName("c"), ctx.freshName("d"), ctx.freshName("i"), ctx.freshName("off"))
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |int $k = $cRef.length / $dim;
         |int $best = 0;
         |double $bestDot = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $k; $c++) {
         |  double $d = 0.0;
         |  int $off = $c * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $d += (double) $v.getFloat($i) * $cRef[$off + $i];
         |  }
         |  if ($d > $bestDot) { $bestDot = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Integer-exact squared-L2 argmin over long-quantized vectors — the
  * codegen assignment kernel behind [[graft.similarity.KMeansInt]]: pure
  * long arithmetic (headroom: milli-unit components ≤ 2·10⁶ give per-
  * term (a−b)² ≤ 1.6·10¹³, ×4096 dims ≈ 6.5·10¹⁶ ≪ 2⁶³), strict `<` so
  * ties keep the SMALLER centroid index — bit-identical to the SQL
  * oracle's (dist, j) tie-break, and ~100× faster than the interpreted
  * higher-order-function formulation at large k (HOFs never codegen).
  * Centroids row-major k×dim, shipped once per task as a reference
  * object — expression tree size O(1) in k. */
/** Sibling of [[NearestCentroidL]] returning the MIN squared L2 distance
  * itself (long) instead of the argmin index — the integer-exact
  * "distance to the assigned centroid" SemDeDup's diversity-preserving
  * keep policy orders on. Same generated loop, same tie semantics (the
  * distance is identical whichever tied centroid wins), same O(1)-in-k
  * expression tree (the k×d table rides as a task reference object). */
case class CentroidSqDistL(child: Expression, centroids: Array[Long], dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "centroid_sq_dist_l"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val k = centroids.length / dim
    var bestDist = Long.MaxValue
    var c = 0
    while (c < k) {
      var d = 0L
      var i = 0
      val off = c * dim
      while (i < n) {
        val t = v.getLong(i) - centroids(off + i); d += t * t; i += 1
      }
      if (d < bestDist) bestDist = d
      c += 1
    }
    bestDist
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val (n, k, bestDist, c, d, i, off, t) = (ctx.freshName("n"),
        ctx.freshName("k"), ctx.freshName("bestDist"),
        ctx.freshName("c"), ctx.freshName("d"), ctx.freshName("i"),
        ctx.freshName("off"), ctx.freshName("t"))
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |int $k = $cRef.length / $dim;
         |long $bestDist = Long.MAX_VALUE;
         |for (int $c = 0; $c < $k; $c++) {
         |  long $d = 0L;
         |  int $off = $c * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $t = $v.getLong($i) - $cRef[$off + $i];
         |    $d += $t * $t;
         |  }
         |  if ($d < $bestDist) { $bestDist = $d; }
         |}
         |${ev.value} = $bestDist;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class NearestCentroidL(child: Expression, centroids: Array[Long], dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "nearest_centroid_l"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val k = centroids.length / dim
    var best = 0
    var bestDist = Long.MaxValue
    var c = 0
    while (c < k) {
      var d = 0L
      var i = 0
      val off = c * dim
      while (i < n) {
        val t = v.getLong(i) - centroids(off + i); d += t * t; i += 1
      }
      if (d < bestDist) { bestDist = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val (n, k, best, bestDist, c, d, i, off, t) = (ctx.freshName("n"),
        ctx.freshName("k"), ctx.freshName("best"), ctx.freshName("bestDist"),
        ctx.freshName("c"), ctx.freshName("d"), ctx.freshName("i"),
        ctx.freshName("off"), ctx.freshName("t"))
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |int $k = $cRef.length / $dim;
         |int $best = 0;
         |long $bestDist = Long.MAX_VALUE;
         |for (int $c = 0; $c < $k; $c++) {
         |  long $d = 0L;
         |  int $off = $c * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $t = $v.getLong($i) - $cRef[$off + $i];
         |    $d += $t * $t;
         |  }
         |  if ($d < $bestDist) { $bestDist = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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

  /** Hyperplane LSH signature (codegen); planes row-major nPlanes×dim. */
  def hyperplaneSig(vec: Column, planes: Array[Double], dim: Int): Column =
    bridge.column(HyperplaneSig(bridge.expression(vec), planes, dim))

  /** Nearest-centroid cell index (codegen); centroids row-major k×dim,
    * pre-normalized for cosine assignment. */
  def nearestCentroid(vec: Column, centroids: Array[Double], dim: Int): Column =
    bridge.column(NearestCentroid(bridge.expression(vec), centroids, dim))

  /** Integer squared-L2 argmin over a long-quantized vector (codegen);
    * centroids row-major k×dim, ties to the smaller index. */
  def nearestCentroidL(vec: Column, centroids: Array[Long], dim: Int): Column =
    bridge.column(NearestCentroidL(bridge.expression(vec), centroids, dim))

  /** Integer squared-L2 distance to the NEAREST centroid (codegen) —
    * the min itself, where [[nearestCentroidL]] is the argmin. */
  def centroidSqDistL(vec: Column, centroids: Array[Long], dim: Int): Column =
    bridge.column(CentroidSqDistL(bridge.expression(vec), centroids, dim))
}
