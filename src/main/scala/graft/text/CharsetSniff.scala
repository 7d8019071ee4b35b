package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Charset sniffing for crawl payloads — the decode step between the
  * wire (q196 WARC bodies are BYTES) and every text operator (q193
  * onward assumes strings): BOM dispatch, hand-rolled RFC 3629 UTF-8
  * validation, Latin-1 fallback — the CCNet/C4-class "is this page
  * UTF-8?" gate, implemented from the public spec (the Warc/Xls
  * discipline).
  *
  * Contract (stated):
  *   - BOM wins: EF BB BF → utf-8 (BOM stripped); FF FE → utf-16le;
  *     FE FF → utf-16be. A BOM is trusted — the payload decodes under
  *     its charset without a second validation pass (a crawl stack
  *     treats a lying BOM as the origin's bug; the fixture's BOMs are
  *     well-formed).
  *   - no BOM: validate UTF-8 by the RFC 3629 table — overlong forms,
  *     surrogates (U+D800–U+DFFF), five/six-byte forms (F5–FF leads),
  *     and truncated tails all REJECT; U+10FFFF (F4 8F BF BF) accepts.
  *   - invalid → latin-1 (ISO 8859-1): total — every byte sequence
  *     decodes, the crawl world's universal fallback.
  * Decoding itself uses the JDK charset AFTER the verdict (the
  * ImageCodec precedent: validation is ours, transcoding is the
  * platform's); n_chars counts Java chars (UTF-16 units — stated).
  *
  * Scale shape: a pure per-row kernel (binary bytes are opaque to
  * Catalyst — the audioFingerprintBands precedent), zero shuffle.
  */
object CharsetSniff {

  /** RFC 3629 §4 well-formedness over the whole byte array. */
  def validUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i) & 0xFF
      if (c < 0x80) i += 1
      else if (c >= 0xC2 && c <= 0xDF) { // 2-byte; C0/C1 overlong → reject
        if (i + 1 >= n || (b(i + 1) & 0xC0) != 0x80) return false
        i += 2
      } else if (c == 0xE0) { // 3-byte, no overlong: second byte A0..BF
        if (i + 2 >= n || (b(i + 1) & 0xFF) < 0xA0 || (b(i + 1) & 0xFF) > 0xBF
          || (b(i + 2) & 0xC0) != 0x80) return false
        i += 3
      } else if (c >= 0xE1 && c <= 0xEC) {
        if (i + 2 >= n || (b(i + 1) & 0xC0) != 0x80 || (b(i + 2) & 0xC0) != 0x80)
          return false
        i += 3
      } else if (c == 0xED) { // 3-byte, no surrogates: second byte 80..9F
        if (i + 2 >= n || (b(i + 1) & 0xFF) < 0x80 || (b(i + 1) & 0xFF) > 0x9F
          || (b(i + 2) & 0xC0) != 0x80) return false
        i += 3
      } else if (c >= 0xEE && c <= 0xEF) {
        if (i + 2 >= n || (b(i + 1) & 0xC0) != 0x80 || (b(i + 2) & 0xC0) != 0x80)
          return false
        i += 3
      } else if (c == 0xF0) { // 4-byte, no overlong: second byte 90..BF
        if (i + 3 >= n || (b(i + 1) & 0xFF) < 0x90 || (b(i + 1) & 0xFF) > 0xBF
          || (b(i + 2) & 0xC0) != 0x80 || (b(i + 3) & 0xC0) != 0x80) return false
        i += 4
      } else if (c >= 0xF1 && c <= 0xF3) {
        if (i + 3 >= n || (b(i + 1) & 0xC0) != 0x80 || (b(i + 2) & 0xC0) != 0x80
          || (b(i + 3) & 0xC0) != 0x80) return false
        i += 4
      } else if (c == 0xF4) { // 4-byte, max U+10FFFF: second byte 80..8F
        if (i + 3 >= n || (b(i + 1) & 0xFF) < 0x80 || (b(i + 1) & 0xFF) > 0x8F
          || (b(i + 2) & 0xC0) != 0x80 || (b(i + 3) & 0xC0) != 0x80) return false
        i += 4
      } else return false // 80..C1 stray continuation/overlong, F5..FF
    }
    true
  }

  /** (enc, decoded text) for one payload, per the class contract. */
  def decode(bytes: Array[Byte]): (String, String) = {
    import java.nio.charset.StandardCharsets._
    if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xEF &&
        (bytes(1) & 0xFF) == 0xBB && (bytes(2) & 0xFF) == 0xBF)
      ("utf-8", new String(bytes, 3, bytes.length - 3, UTF_8))
    else if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xFE)
      ("utf-16le", new String(bytes, 2, bytes.length - 2, UTF_16LE))
    else if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFE && (bytes(1) & 0xFF) == 0xFF)
      ("utf-16be", new String(bytes, 2, bytes.length - 2, UTF_16BE))
    else if (validUtf8(bytes)) ("utf-8", new String(bytes, UTF_8))
    else ("latin-1", new String(bytes, ISO_8859_1))
  }

  /** Sniff a (doc_id, payload) table → (doc_id, enc, n_chars, text). */
  def sniff(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (enc, text) = decode(bytes)
          (id, enc, text.length.toLong, text)
        }
      }.toDF("doc_id", "enc", "n_chars", "text")
  }
}
