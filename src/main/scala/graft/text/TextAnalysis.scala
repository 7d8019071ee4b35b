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

  /** Shannon CHARACTER entropy of the normalized text — the classic
    * cheap noise/repetition signal (near-zero for `aaaa…` spam and
    * base64-ish blobs sit far above prose; used alongside the Gopher
    * battery in public cleaning stacks). Integer protocol (the q89
    * rule) via the identity n·H = n·ln n − Σ_c cnt_c·ln cnt_c: each
    * run's term floor(cnt·ln cnt·10⁶) integerizes BEFORE the exact
    * long sum (commutes), and ent_u = (floor(n·ln n·10⁶) − Σ) div n —
    * micro-nats per character, truncating integral division.
    *
    * Shape: ONE pass — a single aggregate over the sorted character
    * array whose lambda touches only the element and the accumulator
    * (the GopherRepetition fold discipline: higher-order lambdas are
    * interpreted, so a lambda referencing an expensive OUTER expression
    * re-evaluates it per element — the n·ln n identity exists precisely
    * to keep n out of the fold). Zero shuffle, zero fan-out. ASCII
    * contract stated: Spark walks UTF-16 units, DuckDB UTF-8
    * characters — identical on the ASCII range the corpus occupies.
    *
    * Returns (idCol, n_chars, n_distinct_chars, ent_u). */
  def charEntropy(df: org.apache.spark.sql.DataFrame, textCol: String,
      idCol: String): org.apache.spark.sql.DataFrame = {
    val s = normalize(col(textCol))
    def runTerm(run: Column): Column =
      when(run > 0,
        floor(run.cast("double") * log(run.cast("double")) * lit(1e6))
          .cast("long")).otherwise(lit(0L))
    // state: (prev char, current run length, Σ closed-run terms, runs);
    // the sentinel prev is a char normalize() can never emit — the
    // sorted array BEGINS with spaces, so " " would merge the space run
    // into the initial empty one
    val init = struct(lit(0.toChar.toString).as("prev"), lit(0L).as("run"),
      lit(0L).as("s1"), lit(0L).as("nd"))
    val folded = aggregate(array_sort(split(s, "", -1)), init,
      (st, x) => {
        val same = st.getField("prev") === x
        struct(x.as("prev"),
          when(same, st.getField("run") + 1L).otherwise(lit(1L)).as("run"),
          (st.getField("s1") +
            when(same, lit(0L)).otherwise(runTerm(st.getField("run")))).as("s1"),
          (st.getField("nd") + when(same, lit(0L)).otherwise(lit(1L))).as("nd"))
      },
      st => struct(
        (st.getField("s1") + runTerm(st.getField("run"))).as("s1"),
        st.getField("nd").as("nd")))
    df.select(col(idCol), length(s).cast("long").as("n_chars"),
        folded.as("_f"))
      .select(col(idCol), col("n_chars"),
        col("_f.nd").as("n_distinct_chars"),
        (floor(col("n_chars").cast("double") * log(col("n_chars").cast("double"))
          * lit(1e6)).cast("long") - col("_f.s1")).as("_ent_tot"))
      .withColumn("ent_u", expr("_ent_tot DIV n_chars"))
      .drop("_ent_tot")
  }

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

  /** (group, tok) rows under the alnum-word convention (lower, strip
    * non-[a-z0-9 ], collapse, split, drop empties) — the q127/q165
    * tokenization. One generator pass. */
  private def alnumTokenRows(df: org.apache.spark.sql.DataFrame,
      textCol: String, keyCol: Column): org.apache.spark.sql.DataFrame = {
    val norm = regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " ")
    df.select(keyCol.as("__g"),
        explode(split(trim(regexp_replace(norm, "\\s+", " ")), " ", -1)).as("tok"))
      .filter(length(col("tok")) > 0)
  }

  /** Lexical diversity per group (q173's operator form): exact
    * type-token ratio (truncating integer division) + the Σ n_tok²
    * Gini-impurity sufficient statistic as decimal(38,0). One
    * token-count shuffle + one per-group rollup. */
  def lexicalDiversity(df: org.apache.spark.sql.DataFrame, textCol: String,
      groupCol: String): org.apache.spark.sql.DataFrame =
    alnumTokenRows(df, textCol, col(groupCol))
      .groupBy(col("__g").as(groupCol), col("tok"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col(groupCol))
      .agg(sum(col("n")).as("n_tok"), count(lit(1)).as("n_distinct"),
        sum(col("n").cast("decimal(19,0)") * col("n").cast("decimal(18,0)"))
          .cast("decimal(38,0)").as("sum_sq"))
      .select(col(groupCol), col("n_tok"), col("n_distinct"),
        expr("(n_distinct * 1000000L) div n_tok").as("ttr_u"), col("sum_sq"))

  /** Vocabulary drift between corpora A and B (q165's operator form):
    * per-token exact TVD numerator |n_a·B − n_b·A| as decimal(38,0);
    * top-k drifting tokens (bounded TakeOrdered) + a '__tvd' row with
    * the Σ and both totals — the caller is one division from
    * TVD = Σ/(2AB), the engine never rounds. */
  def vocabDrift(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, textCol: String,
      topK: Int): org.apache.spark.sql.DataFrame = {
    val toks = alnumTokenRows(a, textCol, lit(0L))
      .unionByName(alnumTokenRows(b, textCol, lit(1L)))
    val counts = toks.groupBy(col("tok")).agg(
      sum(when(col("__g") === 0L, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("__g") === 1L, 1L).otherwise(0L)).as("n_b"))
    val totals = broadcast(counts.agg(
      sum(col("n_a")).cast("decimal(18,0)").as("ta"),
      sum(col("n_b")).cast("decimal(18,0)").as("tb")))
    val scored = counts.crossJoin(totals) // 1-row broadcast scalar join
      .select(col("tok"), col("n_a"), col("n_b"),
        abs(col("n_a").cast("decimal(19,0)") * col("tb")
          - col("n_b").cast("decimal(19,0)") * col("ta"))
          .cast("decimal(38,0)").as("drift"))
    val top = scored.orderBy(col("drift").desc, col("tok")).limit(topK)
    val global = scored.agg(sum(col("drift")).cast("decimal(38,0)").as("drift"))
      .crossJoin(totals)
      .select(lit("__tvd").as("tok"), col("ta").cast("long").as("n_a"),
        col("tb").cast("long").as("n_b"), col("drift"))
    top.unionByName(global)
  }
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
