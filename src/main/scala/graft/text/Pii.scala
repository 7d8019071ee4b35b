package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Checksum-validated PII detection — the PRECISION step over q70's
  * regex classes: a 13–19 digit run is only a payment-card number if
  * its Luhn check digit holds (ISO/IEC 7812-1; the mod-10 algorithm is
  * public since Luhn's 1960 patent), and production scrubbers
  * (Presidio-class) validate candidates exactly this way because raw
  * digit-run regexes drown in order ids, timestamps and phone numbers.
  * Candidates = word-boundary-delimited 13–19 digit runs (contiguous
  * digits — separator-tolerant matching is upstream normalization,
  * stated); validation is the pure-integer mod-10 fold, engine-portable
  * with no numeric protocol.
  *
  * Everything is a codegen projection over per-row arrays (extract →
  * per-candidate fold) — zero shuffle, the q70/q199 cost class.
  */
object Pii {

  /** Word-boundary 13–19 digit runs. */
  def cardCandidates(text: Column): Column =
    regexp_extract_all(text, lit("\\b[0-9]{13,19}\\b"), lit(0))

  /** Luhn mod-10 validity of a digit string: from the RIGHT, double
    * every second digit (subtracting 9 when the double exceeds 9) and
    * require the total ≡ 0 (mod 10). Pure integer arithmetic inside a
    * single array fold. */
  def luhnValid(cand: Column): Column = {
    val digits = filter(split(cand, ""), d => d =!= "")
    val n = size(digits)
    // i is transform's 0-based index; position from the right is n - i,
    // and Luhn doubles the even positions-from-right
    val terms = transform(digits, (d, i) => {
      val v = d.cast("int")
      val dbl = v * 2
      when(pmod(n - i, lit(2)) === 0,
        dbl - when(dbl > 9, 9).otherwise(0)).otherwise(v)
    })
    pmod(aggregate(terms, lit(0), (acc, t) => acc + t), lit(10)) === 0
  }

  /** Per-row card-detection summary: candidate count, Luhn-valid count,
    * and the md5 of the comma-joined valid candidates (in text order) —
    * pins WHICH candidates validated without shipping the numbers. */
  def cardSummary(text: Column): (Column, Column, Column) = {
    val cands = cardCandidates(text)
    val valid = filter(cands, c => luhnValid(c))
    (size(cands).cast("int"), size(valid).cast("int"),
      md5(array_join(valid, ",")))
  }
}
