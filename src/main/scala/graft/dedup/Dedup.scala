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

  /** Shingle hashes (array<bigint>): one interpreted HOF pass; everything
    * downstream runs on native kernels. */
  def shingleHashes(textCol: Column, k: Int = 3): Column =
    transform(Shingling.wordShingles(textCol, k), s => pmod(xxhash64(s), lit(HashPrime)))

  /** MinHash signature (array<bigint>, length numPerm) over word k-shingles,
    * computed by the native codegen kernel (one tight loop; the naive
    * `transform`/`array_min` composition re-evaluates the shingling per
    * permutation on Catalyst's interpreted HOF path — 100×+ slower). */
  def minHashSignature(textCol: Column, numPerm: Int = 64, k: Int = 3,
      seed: Long = 42L): Column = {
    val ps = perms(numPerm, seed)
    graft.functions.HashFunctions.minHashSig(
      shingleHashes(textCol, k), ps.map(_._1).toArray, ps.map(_._2).toArray, HashPrime)
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
    val ps = perms(numPerm, 42L)
    // Fully native pipeline: hashed shingle sets in one codegen pass (no
    // string shingles materialized), native signature kernel, slim
    // (id, band, bkey) band rows so the shuffle never moves arrays.
    // Hashed sets rejoin only for surviving candidate pairs.
    val sh = hashedShingleSets(df, textCol, idCol, k)
    val buckets = sh
      .select(col("id"), graft.functions.HashFunctions.minHashSig(
        col("sh"), ps.map(_._1).toArray, ps.map(_._2).toArray, HashPrime).as("sig"))
      .select(col("id"), explode(lshBands(col("sig"), bands, rowsPerBand)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.bkey").as("bkey"))
    val candidates = buckets.alias("x")
      .join(buckets.alias("y"), Seq("band", "bkey"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
    verifyPairsJaccard(candidates, sh, threshold)
  }

  /** Distinct hashed word k-shingle sets, (id, sh) — one native pass per
    * doc; the set representation every verify/banding stage shares. */
  def hashedShingleSets(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.HashFunctions.wordShingleHash(
        TextAnalysis.normalize(col(textCol)), k, HashPrime).as("sh"))

  /** Exact-Jaccard verify pass over candidate pairs: shingle sets join in
    * from a once-per-doc projection; per-pair work is one codegen'd
    * intersect/union. */
  def verifyPairsJaccard(pairs: DataFrame, docShingles: DataFrame,
      threshold: Double): DataFrame = {
    val a = docShingles.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = docShingles.select(col("id").as("id_b"), col("sh").as("sh_b"))
    pairs.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---------------- SimHash ----------------

  /** 64-bit SimHash over word tokens: per-bit majority vote of token
    * hashes, computed by the native codegen kernel. */
  def simHash64(textCol: Column): Column =
    graft.functions.HashFunctions.simHash64(
      transform(split(TextAnalysis.normalize(textCol), " ", -1), t => xxhash64(t)))

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

  /** Cosine similarity between two float-array columns: codegen dot-product
    * kernel, double accumulation, deterministic left-to-right order. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosineF(a, b)

  /** Embedding near-duplicate pairs above a cosine threshold. Exact
    * all-pairs — the *verify* path; at scale generate candidates with
    * [[graft.similarity.Ann.lshBuckets]] first. Norms are computed once per
    * row (not per pair) and the pair loop is a single codegen dot product. */
  def embeddingPairs(df: DataFrame, vecCol: String, idCol: String,
      threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.dotF
    val withNorm = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(dotF(col(vecCol), col(vecCol))).as("nrm"))
    val a = withNorm.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a"))
    val b = withNorm.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b"))
    a.join(b, col("id_a") < col("id_b"))
      .filter(dotF(col("v_a"), col("v_b")) / col("n_a") / col("n_b") > threshold)
      .select(col("id_a"), col("id_b"))
  }
}
