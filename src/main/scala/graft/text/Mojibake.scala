package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mojibake repair — the ftfy-class encoding fixer most published
  * pipelines run right after charset decode (C4/CCNet stacks ship
  * `ftfy.fix_text`; this is its core heuristic from first principles):
  * a UTF-8 byte stream mis-decoded as Latin-1/Windows-1252 turns every
  * multi-byte sequence into 2–4 spurious chars ("é" → "Ã©"; "'" →
  * "â€™" under cp1252, whose 0x80–0x9F block decodes to punctuation
  * codepoints above U+00FF), and the repair is the exact inverse —
  * re-encode the chars as Latin-1 bytes (cp1252's high-punctuation
  * block reversed explicitly, [[Cp1252Reverse]])
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

  /** Windows-1252's 0x80–0x9F block, reversed: cp1252 maps these bytes
    * to codepoints ABOVE U+00FF (€ ‚ ƒ „ … † ‡ ˆ ‰ Š ‹ Œ Ž ' ' " " •
    * – — ˜ ™ š › œ ž Ÿ), so the ubiquitous real-world mojibake
    * ("â€™" for U+2019 — bytes E2 80 99 read as cp1252) contains chars
    * a pure Latin-1 inverse can never re-encode. 0x81/0x8D/0x8F/0x90/
    * 0x9D are undefined in cp1252 (most decoders pass them through as
    * C1 controls < 0x100, which the Latin-1 branch already handles). */
  private val Cp1252Reverse: Map[Char, Int] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F)

  /** One repair step: Some(fixed) iff every char re-encodes to the byte
    * a Latin-1 OR Windows-1252 mis-decode would have read it from
    * (chars < 0x100 are their own Latin-1 byte; [[Cp1252Reverse]] covers
    * cp1252's 0x80–0x9F punctuation block), at least one is non-ASCII,
    * and the recovered byte image is valid UTF-8 — i.e. the string IS a
    * UTF-8 stream mis-decoded as Latin-1/cp1252, so re-decoding inverts
    * the mis-decode exactly. Any other char (CJK, unmapped symbols)
    * refuses: genuine non-Latin text is never "repaired". */
  def fixOnce(s: String): Option[String] = {
    var hasHigh = false
    val b = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val byte = if (c < 0x100) c.toInt else Cp1252Reverse.getOrElse(c, -1)
      if (byte < 0) return None
      if (byte >= 0x80) hasHigh = true
      b(i) = byte.toByte
      i += 1
    }
    if (!hasHigh) return None
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
    // cast the id (an int-typed id must not fail analysis — the Bpe
    // kernel's rule) and null-guard the text (one null page must not
    // kill the job: it repairs to itself with 0 fixes)
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, s0) =>
        val s = if (s0 == null) "" else s0
        val (t, n) = fix(s)
        (id, n, s.codePointCount(0, s.length).toLong,
          t.codePointCount(0, t.length).toLong, t)
      })
      .toDF(idCol, "n_fixes", "n_chars_in", "n_chars_out", "fixed")
      .select(col(idCol), col("n_fixes"), col("n_chars_in"),
        col("n_chars_out"), md5(col("fixed")).as("fp"))
  }
}
