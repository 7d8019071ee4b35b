package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Asymmetric shingle-CONTAINMENT join — excerpt / quote / wholesale-
  * inclusion detection, the directed sibling of [[Dedup.jaccardJoin]].
  *
  * A 30-word excerpt of a 3000-word page has Jaccard ≈ 0.01 against its
  * source — invisible to every symmetric near-dup operator in the suite —
  * yet 100% of its shingles appear there. Containment
  * C(a→b) = |S(a) ∩ S(b)| / |S(a)| scores exactly that relation, and a
  * training corpus needs it: quoted passages, syndicated fragments, and
  * doc-inside-doc concatenations are contained, not similar (cf. the
  * containment direction of Broder's resemblance work, STOC'98 —
  * implemented fresh here on the AllPairs prefix-filter machinery the
  * repo already ships for Jaccard).
  *
  * Algorithm (exact, no sketch): reuse [[Dedup.shingleProjection]] — one
  * row per doc, shingle tokens sorted rarest-first under a global
  * (df, tok) total order. A pair qualifies iff overlap ≥ o_a = ⌈t·|S(a)|⌉,
  * so by the standard prefix lemma (if |A∩B| ≥ o, the (|A|−o+1)-prefixes
  * intersect) it is found by equi-joining
  *   - contained side: the (sz_a − o_a + 1)-prefix of each doc with
  *     sz_a ≥ minGrams, and
  *   - containing side: the (sz_b − o_min + 1)-prefix, o_min = ⌈t·minGrams⌉
  *     (sound because o_a ≥ o_min — a longer prefix only adds candidates),
  * then positional pruning (remaining-suffix overlap bound must still
  * reach o_a) and one codegen array_intersect verify per survivor.
  *
  * Scale honesty: unlike the symmetric join there is NO size upper bound
  * on the containing side — a 100 MB page can contain any snippet — so
  * the containing prefix is long (sz_b − o_min + 1 of sz_b tokens). That
  * is intrinsic to exact containment (every published exact overlap join
  * indexes nearly all of the containing side); the knobs that bound the
  * blow-up are `minGrams` (raising it shortens every containing prefix by
  * the same amount and drops confetti docs whose grams appear everywhere)
  * and the rarest-first ordering, which keeps hot-token fan-out minimal
  * for the contained side where it matters. All shuffles are linear in
  * Σ|prefix|; the verify is candidate-sized.
  *
  * Reference behavior: the reference tool's duplicate screens are exact
  * row equality (ref SQL_DATA_INTEGRATION_TOOL.py:282-312 keyed updates);
  * containment is part of the training-data extension surface.
  */
object Containment {

  /** Directed near-containment pairs (id_a, id_b, containment):
    * containment = |S(a)∩S(b)| / |S(a)| ≥ threshold, id_a ≠ id_b, where
    * S = distinct word-k-shingle sets of the normalized text. Docs with
    * |S| < minGrams are excluded from the CONTAINED side only (they can
    * still contain nothing, but can be containers). Both directions of a
    * mutually-containing pair are emitted — direction is the point. */
  def containmentJoin(df: DataFrame, textCol: String, idCol: String,
      threshold: Double, k: Int = 3, minGrams: Int = 8): DataFrame =
    // localCheckpoint for the same reason jaccardJoin does: the projection
    // feeds both prefix sides and the verify sets; RDD-level blocks are
    // ContextCleaner-freed with the plan (no per-call persist leak).
    containmentJoinOrdered(
      Dedup.shingleProjection(df, textCol, idCol, k).localCheckpoint(),
      threshold, minGrams)

  /** The join phase over a prebuilt (and ideally persisted)
    * [[Dedup.shingleProjection]] — see [[containmentJoin]]. */
  def containmentJoinOrdered(ordered: DataFrame, threshold: Double,
      minGrams: Int): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold=$threshold outside (0,1]")
    require(minGrams >= 1, s"minGrams=$minGrams must be >= 1")
    val oMin = math.ceil(threshold * minGrams).toLong
    // Required overlap for a given contained doc: the smallest integer
    // ≥ t·sz_a (overlap is integral, so ceil is exactly the bound).
    def oA: Column = ceil(col("sz_a") * lit(threshold))
    val contained = ordered.filter(col("sz") >= minGrams)
      .select(col("id").as("id_a"), col("sz").as("sz_a"),
        posexplode(slice(col("toks"), lit(1),
          (col("sz") - ceil(col("sz") * lit(threshold)) + 1).cast("int")))
          .as(Seq("p_a", "tok")))
    val containing = ordered
      .select(col("id").as("id_b"), col("sz").as("sz_b"),
        posexplode(slice(col("toks"), lit(1),
          greatest(lit(0), (col("sz") - lit(oMin) + 1).cast("int"))))
          .as(Seq("p_b", "tok")))
    val cands = contained.join(containing, "tok")
      .filter(col("id_a") =!= col("id_b") &&
        col("sz_b") >= oA &&
        // posexplode is 0-based: tokens at-or-after this shared one number
        // sz - p on each side; the overlap can't exceed the smaller count.
        least(col("sz_a") - col("p_a"), col("sz_b") - col("p_b")) >= oA)
      .select("id_a", "id_b")
    val a = ordered.select(col("id").as("id_a"), col("toks").as("sh_a"))
    val b = ordered.select(col("id").as("id_b"), col("toks").as("sh_b"))
    // verify-then-dedup (the jaccardJoinOrdered argument): re-verified
    // multiplicity is answer-shaped, the dedup shuffle is answer-sized.
    cands.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        // one IEEE division of exact integer operands — portable.
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(col("sh_a"))).as("containment"))
      .filter(col("containment") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }
}
