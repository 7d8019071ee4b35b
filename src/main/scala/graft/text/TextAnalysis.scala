package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM training-data pipelines.
  * Everything here is a pure Catalyst expression tree built from
  * `org.apache.spark.sql.functions` — whole-stage-codegen'd, no UDFs, no
  * shuffle: at 100 TB these run as a single map stage over the corpus.
  */
object TextAnalysis {

  /** Whitespace-collapse + lowercase + trim — canonical text form. */
  def normalize(c: Column): Column = trim(regexp_replace(lower(c), "\\s+", " "))

  /** Scala-side mirror of [[normalize]] for per-row kernels (codec
    * batches, BPE segmentation) — must stay semantically identical. */
  def normalizeString(s: String): String =
    s.toLowerCase.replaceAll("\\s+", " ").trim

  /** Content fingerprint of the normalized text (exact-dedup key). */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** Naive whitespace token count (split on single space). */
  def wsTokenCount(c: Column): Column = size(split(c, " ", -1))

  /** Word tokens: alnum runs, empties dropped (BPE-ish pre-tokenizer). */
  def wordTokens(c: Column): Column =
    filter(split(c, "[^A-Za-z0-9]+", -1), x => length(x) > 0)

  def wordTokenCount(c: Column): Column = size(wordTokens(c))

  /** Quality signals: char length, alpha ratio, whitespace ratio, mean word
    * length, distinct-token ratio. Ratios are double divisions of exact
    * integer counts — engine-portable. */
  def nChars(c: Column): Column = length(c)
  def nSpaces(c: Column): Column = length(c) - length(regexp_replace(c, " ", ""))
  def alphaRatio(c: Column): Column =
    length(regexp_replace(c, "[^A-Za-z]", "")) / length(c)
  def avgWordLen(c: Column): Column =
    (length(c) - nSpaces(c)) / (nSpaces(c) + lit(1))
  def uniqTokenRatio(c: Column): Column = {
    val toks = split(c, " ", -1)
    size(array_distinct(toks)) / size(toks)
  }

  /** Stopword profiles for the n-gram-free language-ID heuristic. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "du", "est", "que"),
    "es" -> Seq("el", "la", "de", "que", "los", "las", "un", "una", "es", "en"),
    "de" -> Seq("der", "die", "und", "das", "ein", "ist", "nicht", "mit", "den", "von"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "ni", "ta", "men", "zai", "you"))

  /** Heuristic language-ID: argmax of stopword hits per profile; ties break
    * to profile order. Pure expression: array of (score, -rank, lang)
    * structs reduced with array_max. */
  def langId(c: Column): Column = {
    val toks = array_distinct(split(normalize(c), " ", -1))
    val scored = langProfiles.zipWithIndex.map { case ((lang, words), i) =>
      struct(
        size(array_intersect(toks, array(words.map(lit): _*))).as("score"),
        lit(-i).as("prio"),
        lit(lang).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }

  /** Rolling-hash document sketch: min of xxhash64 over word k-shingles
    * (a 1-perm minhash; winnowing-style representative). */
  def rollingHashMin(c: Column, k: Int = 3): Column =
    array_min(transform(Shingling.wordShingles(c, k), s => xxhash64(s)))

  // ---------------- PII detection / redaction ----------------

  /** PII patterns shared by [[piiCounts]] and [[redactPii]] — deliberately
    * restricted to the regex subset Java regex and RE2 (DuckDB/Trino/Go)
    * interpret identically (no lookaround, no backreferences), so redaction
    * is oracle-checkable across engines. Order matters downstream: emails
    * are redacted before phones/IPs so their digit runs can't re-match. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\d{3}[-. ]\\d{3}[-. ]\\d{4}"
  val Ipv4Re = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  /** Per-class PII match counts over the raw text: (n_email, n_phone,
    * n_ip) int columns. Pure codegen projections — a 100 TB corpus scan. */
  def piiCounts(c: Column): Seq[Column] = Seq(
    regexp_count(c, lit(EmailRe)).cast("int").as("n_email"),
    regexp_count(c, lit(PhoneRe)).cast("int").as("n_phone"),
    regexp_count(c, lit(Ipv4Re)).cast("int").as("n_ip"))

  /** Redact PII in place: emails → [EMAIL], then phones → [PHONE], then
    * IPv4s → [IP]. Sequential application (email first) keeps the classes
    * disjoint: a redacted token contains no digits or @ to re-match. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "[EMAIL]"),
        PhoneRe, "[PHONE]"),
      Ipv4Re, "[IP]")
}

/** Word k-shingling shared by text fingerprints and MinHash dedup. */
object Shingling {
  /** Distinct word k-shingles of the normalized text; documents shorter
    * than k words collapse to one whole-text shingle. */
  def wordShingles(c: Column, k: Int = 3): Column = {
    val toks = split(TextAnalysis.normalize(c), " ", -1)
    val n = size(toks)
    array_distinct(
      when(n >= k,
        transform(sequence(lit(1), n - (k - 1)),
          i => array_join(slice(toks, i, lit(k)), " ")))
        .otherwise(array(array_join(toks, " "))))
  }
}
