package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mojibake repair — the ftfy-class encoding fixer most published
  * pipelines run right after charset decode (C4/CCNet stacks ship
  * `ftfy.fix_text`; this is its core heuristic from first principles):
  * a UTF-8 byte stream mis-decoded as Latin-1/Windows-1252 turns every
  * multi-byte sequence into 2–4 spurious chars ("é" → "Ã©"), and the
  * repair is the exact inverse — re-encode the chars as Latin-1 bytes
  * and re-decode as UTF-8, accepted ONLY when the byte image is valid
  * RFC 3629 UTF-8 with at least one non-ASCII char ([[CharsetSniff
  * .validUtf8]], the q204 validator). Nested double-mis-decodes peel
  * one layer per step (bounded iteration).
  *
  * Honesty note (the ftfy trade-off, stated): genuine Latin-1 prose
  * whose non-ASCII chars happen to form valid UTF-8 sequences would be
  * "repaired" too — for natural text the collision is vanishingly rare
  * (a lead byte C2–F4 must be followed by exactly the right
  * continuation bytes), which is why production pipelines accept the
  * heuristic; a lone high char (e.g. " Ã " before a space) makes the
  * byte image INVALID UTF-8 and is correctly left alone.
  *
  * Scale shape: a pure per-row kernel, zero shuffle — the q199/q204
  * cost class.
  */
object Mojibake {

  /** One repair step: Some(fixed) iff every char is Latin-1-encodable
    * (< 0x100), at least one is non-ASCII, and the Latin-1 byte image
    * is valid UTF-8 — i.e. the string IS a UTF-8 stream mis-decoded as
    * Latin-1, so re-decoding inverts the mis-decode exactly. */
  def fixOnce(s: String): Option[String] = {
    var hasHigh = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 0x100) return None
      if (c >= 0x80) hasHigh = true
      i += 1
    }
    if (!hasHigh) return None
    val b = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    if (CharsetSniff.validUtf8(b))
      Some(new String(b, java.nio.charset.StandardCharsets.UTF_8))
    else None
  }

  /** Iterated repair — nested double-mis-decodes peel one layer per
    * step; returns (repaired, nFixes). The bound is a loop guard, not a
    * correctness knob: real mojibake is 1–2 layers deep. */
  def fix(s: String, maxSteps: Int = 3): (String, Int) = {
    var cur = s
    var n = 0
    var more = true
    while (more && n < maxSteps) fixOnce(cur) match {
      case Some(next) => cur = next; n += 1
      case None => more = false
    }
    (cur, n)
  }

  /** Repair a (idCol, textCol) table → (id, n_fixes, n_chars_in,
    * n_chars_out, fp) with fp = md5 of the repaired text (char counts
    * are codepoints — the cross-engine unit). Per-row kernel, zero
    * shuffle. */
  def repair(spark: SparkSession, docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    import spark.implicits._
    docs.select(col(idCol), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, s) =>
        val (t, n) = fix(s)
        (id, n, s.codePointCount(0, s.length).toLong,
          t.codePointCount(0, t.length).toLong, t)
      })
      .toDF(idCol, "n_fixes", "n_chars_in", "n_chars_out", "fixed")
      .select(col(idCol), col("n_fixes"), col("n_chars_in"),
        col("n_chars_out"), md5(col("fixed")).as("fp"))
  }
}
