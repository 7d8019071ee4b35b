package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Similarity search over an embedding column (array<float>).
  *
  * `bruteTopK` is the exact baseline: queries are broadcast (the query set
  * is always small relative to the corpus), the corpus streams through one
  * codegen stage — no corpus shuffle. At 100 TB the scale path is
  * `lshTopK`: random-hyperplane signatures bucket the corpus so each query
  * probes only its colliding buckets.
  */
object Ann {

  /** Deterministic random hyperplanes (dim × nPlanes), seed-stable. */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val r = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(r.nextGaussian()))
  }

  /** Exact top-k neighbors for each query vector by cosine similarity.
    * Tie-break: higher cosine first, then smaller neighbor id. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int): DataFrame = {
    import graft.functions.VectorFunctions.dotF
    val q = broadcast(queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      sqrt(dotF(col(vecCol), col(vecCol))).as("q_nrm")))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      sqrt(dotF(col(vecCol), col(vecCol))).as("n_nrm"))
    val scored = c.join(q, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (dotF(col("q_vec"), col("n_vec")) / col("q_nrm") / col("n_nrm")).as("cos"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("n_id"))
  }

  /** Hard-negative mining for contrastive training (the DPR recipe —
    * Karpukhin et al. EMNLP'20 §4.2: negatives that are semantically
    * CLOSE to the anchor but not positives are what keep the
    * contrastive gradient informative once random negatives go trivial):
    * for each anchor, the k most-cosine-similar corpus vectors whose
    * LABEL differs from the anchor's (label = the positive-equivalence
    * key — a class, a near-dup cluster id, a query-group). The
    * similarity-RANKED complement of TrainingPrep.negativeSample's
    * random draw.
    *
    * Scale shape: anchors broadcast (an epoch mines per anchor batch —
    * always the small side); the corpus streams through ONE codegen
    * scoring stage into the bounded scored_top_k heap — map-side
    * partials ship tasks×anchors×k entries, never the scored rows, and
    * no per-anchor rank window ever sorts the corpus (ties prefer the
    * smaller neighbor id, the bruteTopK convention). */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, vecCol: String,
      idCol: String, labelCol: String, k: Int): DataFrame = {
    import graft.functions.VectorFunctions.dotF
    // zero-norm guard: arbitrary labeled training corpora carry padded /
    // zero vectors, whose cosine is NaN — and NaN sorts ABOVE every real
    // number in Spark, so one degenerate corpus row would surface as the
    // top hard negative for every anchor. Degenerate rows are excluded
    // on both sides (a zero vector has no direction to be "close" to).
    val q = broadcast(anchors.select(col(idCol).as("q_id"),
      col(vecCol).as("q_vec"), col(labelCol).as("q_lbl"),
      sqrt(dotF(col(vecCol), col(vecCol))).as("q_nrm"))
      .filter(col("q_nrm") > 0))
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      col(labelCol).as("n_lbl"),
      sqrt(dotF(col(vecCol), col(vecCol))).as("n_nrm"))
      .filter(col("n_nrm") > 0)
    val scored = c.join(q, col("q_lbl") =!= col("n_lbl"))
      .select(col("q_id"), col("n_id"),
        (dotF(col("q_vec"), col("n_vec")) / col("q_nrm") / col("n_nrm")).as("cos"))
    scored.groupBy(col("q_id"))
      .agg(graft.functions.AggFunctions
        .scoredTopK(col("cos"), col("n_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rk"),
        col("e.id").as("n_id"))
  }

  /** Exact top-k via the custom physical operator (CosineTopKExec): bounded
    * per-partition heaps, no shuffle/sort of scored rows — the whole-operator
    * form of [[bruteTopK]] for corpora where the scored-row shuffle is the
    * bottleneck. Queries are a driver-side array (always the small side). */
  def cosineTopKExec(corpus: DataFrame, queries: Array[(Long, Array[Float])],
      vecCol: String, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.graft.{bridge, CosineTopKPlan, CosineTopKStrategy}
    val spark = corpus.sparkSession
    if (!spark.experimental.extraStrategies.contains(CosineTopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ CosineTopKStrategy
    }
    bridge.ofRows(spark,
      CosineTopKPlan(queries, k, idCol, vecCol,
        bridge.logicalPlan(corpus.select(col(idCol), col(vecCol)))))
  }

  /** Random-hyperplane signature (one long; bit i = sign of dot with plane
    * i), computed by the native codegen kernel in one pass per row. */
  def signature(vec: Column, planes: Seq[Seq[Double]]): Column =
    graft.functions.VectorFunctions.hyperplaneSig(
      vec, planes.flatten.toArray, planes.head.length)

  /** (band, chunk) bucket keys from a signature — nPlanes/bandBits buckets
    * per vector; join corpus to queries on bucket equality for candidates. */
  def lshBuckets(sig: Column, nPlanes: Int, bandBits: Int): Column = {
    val bands = nPlanes / bandBits
    val mask = (1L << bandBits) - 1
    array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        shiftright(sig, b * bandBits).bitwiseAND(mask).as("chunk"))): _*)
  }

  /** Multi-probe bucket keys for the query side: besides each band's own
    * chunk, probe every single-bit-flip neighbor chunk — vectors near a
    * hyperplane land one bit away, and probing recovers them without
    * touching the corpus-side layout. */
  def lshProbeBuckets(sig: Column, nPlanes: Int, bandBits: Int): Column = {
    val bands = nPlanes / bandBits
    val mask = (1L << bandBits) - 1
    array((0 until bands).flatMap { b =>
      val base = shiftright(sig, b * bandBits).bitwiseAND(mask)
      (base +: (0 until bandBits).map(bit => base.bitwiseXOR(1L << bit)))
        .map(chunk => struct(lit(b).as("band"), chunk.as("chunk")))
    }: _*)
  }

  /** (q_id, rk, n_id) from scored candidate rows (q_id, n_id, cos) via the
    * bounded-heap aggregate [[graft.functions.AggFunctions.scoredTopK]]:
    * each map task partial-aggregates its candidates to ≤ k per query
    * before the exchange, so only |tasks|×|queries|×k bounded entries
    * shuffle — never the full scored candidate set (the window-row_number
    * formulation this replaces shuffles and sorts every scored row). The
    * heap is distinct-by-id, so band-duplicate candidates need no
    * dropDuplicates pass: verify-then-dedup, a duplicate costs one extra
    * dot product instead of a pair-level shuffle. */
  private[graft] def heapRank(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("q_id"))
      .agg(graft.functions.AggFunctions.scoredTopK(col("cos"), col("n_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("p", "s")))
      .select(col("q_id"), (col("p") + 1).cast("int").as("rk"), col("s.id").as("n_id"))

  /** Approximate top-k: LSH candidates (multi-band hyperplane buckets, with
    * single-bit multi-probe on the query side) then exact cosine rerank
    * within candidates — scored straight into per-partition bounded heaps
    * ([[heapRank]]), so no candidate-row shuffle survives. Recall < 1 by
    * design; defaults (24 planes / 8 bands of 3 bits + multi-probe) measure
    * 1.00 recall@5 over 50 test queries (0.84 without probes, 0.41 for
    * 16 planes / 4-bit bands). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, dim: Int, nPlanes: Int = 24, bandBits: Int = 3,
      seed: Long = 42L, multiProbe: Boolean = true): DataFrame = {
    val planes = hyperplanes(dim, nPlanes, seed)
    def withBuckets(df: DataFrame, id: String, vec: String, probe: Boolean) = {
      val sig = signature(col(vecCol), planes)
      val buckets = if (probe) lshProbeBuckets(sig, nPlanes, bandBits)
        else lshBuckets(sig, nPlanes, bandBits)
      df.select(col(idCol).as(id), col(vecCol).as(vec), explode(buckets).as("b"))
        .select(col(id), col(vec), col("b.band").as("band"), col("b.chunk").as("chunk"))
    }
    val qb = broadcast(withBuckets(queries, "q_id", "q_vec", multiProbe))
    val cb = withBuckets(corpus, "n_id", "n_vec", probe = false)
    val cands = cb.join(qb, Seq("band", "chunk"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), Dedup.cosine(col("q_vec"), col("n_vec")).as("cos"))
    heapRank(cands, k)
  }
}
