package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.{Shingling, TextAnalysis}

/** Deduplication operators for LLM training corpora.
  *
  * Scale design (100 TB): nothing here is O(n²) on the full corpus. Exact
  * dedup is a hash groupBy (one shuffle on the fingerprint). MinHash/SimHash
  * emit a bounded number of bucket keys per document (bands / hamming
  * chunks); candidate pairs only form *within* buckets, so the shuffle is
  * |docs|×bands rows and the join fans out only where signatures collide.
  * The expensive exact verify (Jaccard / hamming / cosine) runs on candidate
  * pairs only.
  */
object Dedup {

  // ---------------- exact ----------------

  /** Exact dedup on the normalized-text fingerprint: one representative
    * (min id) per content hash + the duplicate count. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // ---------------- MinHash + LSH ----------------

  /** Deterministic affine permutation parameters for MinHash. Coefficients
    * stay within 31 bits so a*h+b over 31-bit-reduced hashes never exceeds
    * 2^62 — overflow-free under ANSI mode. */
  private val HashPrime = 2147483647L // 2^31 - 1
  private def perms(n: Int, seed: Long): Seq[(Long, Long)] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)(((r.nextInt(Int.MaxValue - 1) + 1).toLong, r.nextInt(Int.MaxValue).toLong))
  }

  /** MinHash signature (array<bigint>, length numPerm) over word k-shingles.
    * Pure expression tree — codegen'd, no UDF. */
  def minHashSignature(textCol: Column, numPerm: Int = 64, k: Int = 3,
      seed: Long = 42L): Column = {
    val hashes = transform(Shingling.wordShingles(textCol, k),
      s => pmod(xxhash64(s), lit(HashPrime)))
    val ps = perms(numPerm, seed)
    array(ps.map { case (a, b) =>
      array_min(transform(hashes, h => pmod(h * lit(a) + lit(b), lit(HashPrime))))
    }: _*)
  }

  /** Explode a signature into (band, bandKey) LSH bucket keys. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(lit(b), array_join(transform(
          slice(sig, b * rowsPerBand + 1, rowsPerBand), x => x.cast("string")), ",")).as("bkey"))
    }: _*)

  /** Near-duplicate pairs by MinHash LSH, verified with exact Jaccard over
    * shingle sets. Returns (id_a, id_b, jaccard) with id_a < id_b. */
  def minHashPairs(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.5, numPerm: Int = 64, bands: Int = 16,
      k: Int = 3): DataFrame = {
    val rowsPerBand = numPerm / bands
    val withSig = df.select(
      col(idCol).as("id"),
      Shingling.wordShingles(col(textCol), k).as("sh"),
      minHashSignature(col(textCol), numPerm, k).as("sig"))
    val buckets = withSig
      .select(col("id"), col("sh"), explode(lshBands(col("sig"), bands, rowsPerBand)).as("b"))
      .select(col("id"), col("sh"), col("b.band").as("band"), col("b.bkey").as("bkey"))
    val a = buckets.select(col("band"), col("bkey"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = buckets.select(col("band"), col("bkey"), col("id").as("id_b"), col("sh").as("sh_b"))
    val candidates = a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---------------- SimHash ----------------

  /** 64-bit SimHash over word tokens: per-bit vote of token hashes.
    * Bit indices are compile-time constants, so shifts stay codegen-able. */
  def simHash64(textCol: Column): Column = {
    val hashes = transform(split(TextAnalysis.normalize(textCol), " ", -1), t => xxhash64(t))
    def bitsOf(h: Column): Column =
      array((0 until 64).map(i =>
        shiftright(h, i).bitwiseAND(1).cast("int") * 2 - 1): _*)
    val votes = aggregate(hashes, array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, bitsOf(h), (a, b) => a + b))
    val pow2 = array((0 until 64).map(i => lit(1L << i)): _*)
    aggregate(zip_with(votes, pow2, (v, p) => when(v > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Near-duplicate pairs by SimHash: band the 64-bit hash into four 16-bit
    * chunks (guarantees recall for hamming ≤ 3), candidate on chunk
    * equality, verify with exact popcount of xor. */
  def simHashPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSim = df.select(col(idCol).as("id"), simHash64(col(textCol)).as("sim"))
    val chunked = withSim.select(col("id"), col("sim"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sim"), b * 16).bitwiseAND(0xFFFFL).as("chunk"))): _*)).as("c"))
      .select(col("id"), col("sim"), col("c.band").as("band"), col("c.chunk").as("chunk"))
    val a = chunked.select(col("band"), col("chunk"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = chunked.select(col("band"), col("chunk"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // ---------------- n-gram Jaccard verify ----------------

  /** Exact n-gram Jaccard similarity between two text columns (the verify
    * pass applied to candidate pairs — never run it all-pairs at scale). */
  def ngramJaccard(a: Column, b: Column, k: Int = 3): Column = {
    val sa = Shingling.wordShingles(a, k)
    val sb = Shingling.wordShingles(b, k)
    size(array_intersect(sa, sb)).cast("double") / size(array_union(sa, sb))
  }

  // ---------------- embedding cosine ----------------

  /** Cosine similarity between two float-array columns, computed in double
    * with a deterministic left-to-right fold. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  /** Embedding near-duplicate pairs above a cosine threshold. Exact
    * all-pairs — the *verify* path; at scale generate candidates with
    * [[graft.similarity.Ann.lshBuckets]] first. */
  def embeddingPairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .filter(cosine(col("v_a"), col("v_b")) > threshold)
      .select(col("id_a"), col("id_b"))
  }
}
