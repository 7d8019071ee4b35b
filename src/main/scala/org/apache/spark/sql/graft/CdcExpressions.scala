package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries via a polynomial ROLLING hash — the
  * classic Karp–Rabin window hash the LBFS/rsync family actually uses
  * (Muthitacharoen SOSP'01), as one O(len) primitive loop inside
  * whole-stage codegen. Returns the 1-based end positions `i`
  * (w ≤ i ≤ len) where
  *
  *   H(i) = Σ_{k=1..w} code(t[i-w+k]) · B^(w-k)  mod P   ≡ 0 (mod m)
  *
  * with B = 131 and P = 2^31−1 (Mersenne prime). Every intermediate fits
  * a signed 64-bit integer (operands stay < 2^39), so the SAME value is
  * computable in any engine with 64-bit integers: the DuckDB oracle
  * replays each window as an explicit Σ code·B^j sum with the sixteen
  * B^j mod P coefficients inlined as literals — bit-for-bit equality
  * with no engine-specific hash builtin. That portability is why this is
  * a bespoke polynomial and not xxhash64/md5: r10 shipped per-window md5
  * for the same portability and paid O(len·w) hashing (51 s at sf0.1,
  * ~⅓ of the whole bench suite); the rolling form is the O(len) plan
  * that carries to 100 TB.
  *
  * Contract: input must be ASCII (the repo's [a-z0-9 ] normalization) so
  * byte positions == char positions in both engines; hashing is over
  * bytes.
  */
case class RollingChunkBounds(child: Expression, w: Int, m: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(w >= 2, s"w must be >= 2, got $w")
  require(m >= 2, s"m must be >= 2, got $m")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "rolling_chunk_bounds"

  import RollingChunkBounds.{Base, Prime}

  /** B^(w-1) mod P — the outgoing char's coefficient. */
  private val bpw: Long = {
    var x = 1L; var j = 0
    while (j < w - 1) { x = x * Base % Prime; j += 1 }
    x
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    val n = b.length
    val buf = new Array[Int](if (n >= w) n - w + 1 else 0)
    var cnt = 0
    var h = 0L
    var i = 0
    while (i < n) {
      if (i >= w) {
        h -= (b(i - w) & 0xff).toLong * bpw % Prime
        if (h < 0) h += Prime
      }
      h = (h * Base + (b(i) & 0xff)) % Prime
      if (i >= w - 1 && h % m == 0) { buf(cnt) = i + 1; cnt += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val (b, n, buf, cnt, h, i) = (ctx.freshName("b"), ctx.freshName("n"),
        ctx.freshName("buf"), ctx.freshName("cnt"), ctx.freshName("h"), ctx.freshName("i"))
      s"""
         |byte[] $b = $c.getBytes();
         |int $n = $b.length;
         |int[] $buf = new int[$n >= $w ? $n - $w + 1 : 0];
         |int $cnt = 0;
         |long $h = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($i >= $w) {
         |    $h -= (long)($b[$i - $w] & 0xff) * ${bpw}L % ${Prime}L;
         |    if ($h < 0) $h += ${Prime}L;
         |  }
         |  $h = ($h * ${Base}L + ($b[$i] & 0xff)) % ${Prime}L;
         |  if ($i >= $w - 1 && $h % $m == 0) $buf[$cnt++] = $i + 1;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($buf, $cnt));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingChunkBounds {
  val Base = 131L
  val Prime = 2147483647L // 2^31 - 1, Mersenne

  /** The w coefficients B^(w-1) … B^0 mod P, in window order — what the
    * DuckDB oracle inlines as literals to replay each window hash. */
  def coefficients(w: Int): Array[Long] = {
    val out = new Array[Long](w)
    out(w - 1) = 1L
    var j = w - 2
    while (j >= 0) { out(j) = out(j + 1) * Base % Prime; j -= 1 }
    out
  }
}
