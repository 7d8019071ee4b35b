package graft.similarity

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance rerank (Carbonell & Goldstein SIGIR'98) —
  * the retrieval-diversity pass a RAG stack runs between ANN search and
  * the prompt: plain top-k returns five paraphrases of the same passage
  * (this corpus is CLUSTERED — that is not hypothetical); MMR greedily
  * picks argmax_i [λ·rel(i) − (1−λ)·max_{j∈S} sim(i, j)], trading
  * relevance against redundancy with what is already selected.
  *
  * Exactness: similarities are integer dot products of int8 codes
  * ([[Quantize]] — the form an embedding store serves candidates in
  * anyway), so at λ = 1/2 the argmax compares EXACT longs (rel − maxsim;
  * the ½ scales out) with ties to the smaller id — no float ordering
  * anywhere, so the greedy is engine-portable round for round (stronger
  * than q32's rank-robustness argument). Code dots ride the native
  * float kernel: every partial sum is an integer < 2^24 (64 dims ×
  * 127² < 2²⁰), so float accumulation is EXACT.
  *
  * Scale shape: the distributed work is the corpus-wide relevance scan
  * (one projection) + the bounded-heap shortlist (ScoredTopK — shuffles
  * tasks×N entries, never scored rows); the greedy itself touches only
  * the N-row shortlist, collected driver-side BOUNDED BY CONSTRUCTION
  * (the q108 k×d-centroids precedent) — exactly where production
  * rerankers run, since N is the answer-size knob, not a corpus knob.
  */
object Mmr {

  /** (rk, n_id, rel, cut): the k MMR selections in pick order, with the
    * exact relevance dot and the selection-time marginal cut =
    * rel − max sim to previously selected (cut = rel for rk = 1). The
    * probe vector is `queryId`'s row (excluded from candidates). */
  def rerank(emb: DataFrame, vecCol: String, idCol: String, queryId: Long,
      shortlist: Int = 32, k: Int = 5): DataFrame = {
    require(k >= 1 && k <= shortlist,
      s"k must be in [1, shortlist=$shortlist], got $k")
    import graft.functions.VectorFunctions.dotF
    val spark = emb.sparkSession

    // the float-dot exactness claim (each partial sum < 2^24) holds
    // only while d·127² < 2^24, i.e. d ≤ 1024 — enforced per row,
    // inline on the scan the relevance pass already makes (a wider
    // vector raises loudly instead of silently rounding the greedy)
    // isNull first: size(null) is null, so without the guard a NULL vector
    // would fall through to the error branch with a misleading dim message —
    // nulls flow through quantization as nulls, as before the bound existed
    val dimOk = when(col(vecCol).isNull || size(col(vecCol)) <= 1024,
      col(vecCol)).otherwise(
      raise_error(concat(lit("Mmr.rerank: vector dim "),
        size(col(vecCol)).cast("string"),
        lit(" > 1024 breaks the exact-float-dot bound (d*127^2 < 2^24)")))
        .cast(emb.schema(emb.schema.fieldIndex(vecCol)).dataType))
    val coded = emb.select(col(idCol).as("n_id"),
      transform(Quantize.codes(dimOk, Quantize.scaleOf(dimOk)),
        _.cast("float")).as("codes"))
    val probe = broadcast(coded.filter(col("n_id") === queryId)
      .select(col("codes").as("q_codes")))
    val scored = coded.filter(col("n_id") =!= queryId)
      .crossJoin(probe) // 1-row broadcast scalar join
      .select(col("n_id"), col("codes"),
        dotF(col("codes"), col("q_codes")).cast("long").as("rel"))
    val top = scored
      .agg(graft.functions.AggFunctions
        .scoredTopK(col("rel").cast("double"), col("n_id"), shortlist).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.id").as("n_id"))
      .join(scored, "n_id")
      .select(col("n_id"), col("rel"), col("codes"))

    // shortlist-sized collect: bounded by the N knob, not the corpus
    val cand = top.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getSeq[Float](2).map(_.toLong).toArray)
    }.sortBy(c => (-c._2, c._1))
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.foldLeft(0L)((s, i) => s + a(i) * b(i))

    val picks = collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    val selected = collection.mutable.ArrayBuffer.empty[(Long, Array[Long])]
    val remaining = collection.mutable.ArrayBuffer(cand: _*)
    for (rk <- 1 to math.min(k, cand.length)) {
      val best = remaining.map { case (id, rel, cs) =>
        val maxSim = if (selected.isEmpty) 0L
          else selected.map(s => dot(cs, s._2)).max
        (rel - maxSim, id, rel, cs)
      }.minBy(t => (-t._1, t._2)) // highest cut, then smallest id
      picks += ((rk, best._2, best._3, best._1))
      selected += ((best._2, best._4))
      remaining -= remaining.find(_._1 == best._2).get
    }
    import spark.implicits._
    picks.toSeq.toDF("rk", "n_id", "rel", "cut")
  }
}
