package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed word k-shingles of a (pre-normalized) string, in one
  * native pass: tokenize on single spaces over the UTF-8 bytes, xxhash64
  * each token, combine each k-window with an xxhash64 chain, reduce into
  * [0, prime) for overflow-safe MinHash arithmetic downstream.
  *
  * Replaces the `transform(sequence(...), i -> array_join(slice(...)))`
  * composition, which materializes every shingle as a string on Catalyst's
  * interpreted HOF path — the dominant cost of corpus dedup at bench scale.
  * Texts shorter than k tokens produce one whole-text shingle (same
  * convention as graft.text.Shingling.wordShingles).
  */
case class WordShingleHash(child: Expression, k: Int, prime: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hash"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(WordShingleHash.compute(input.asInstanceOf[UTF8String], k, prime))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  org.apache.spark.sql.graft.WordShingleHash.compute($c, $k, ${prime}L));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingleHash {
  private final val Seed = 42L

  /** Shared by eval and codegen — a static compiled kernel either way. */
  def compute(s: UTF8String, k: Int, prime: Long): Array[Long] = {
    val bytes = s.getBytes
    // token hashes via xxhash64 over each token's byte slice
    var tokens = new Array[Long](8)
    var nTok = 0
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (nTok == tokens.length) tokens = java.util.Arrays.copyOf(tokens, nTok * 2)
        tokens(nTok) = XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + start, i - start, Seed)
        nTok += 1
        start = i + 1
      }
      i += 1
    }
    val out = new java.util.HashSet[Long]()
    if (nTok < k) {
      // whole-text shingle
      out.add(floorMod(XXH64.hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, Seed), prime))
    } else {
      var w = 0
      while (w <= nTok - k) {
        var acc = Seed
        var j = 0
        while (j < k) { acc = XXH64.hashLong(tokens(w + j), acc); j += 1 }
        out.add(floorMod(acc, prime))
        w += 1
      }
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    java.util.Arrays.sort(arr) // deterministic order
    arr
  }

  private def floorMod(v: Long, prime: Long): Long = {
    val m = v % prime
    if (m < 0) m + prime else m
  }
}
