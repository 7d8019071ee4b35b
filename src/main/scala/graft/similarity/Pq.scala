package graft.similarity

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One PQ-encoded vector: m codebook indices (one byte each at k ≤ 256). */
final case class PqCode(id: Long, codes: Array[Byte])

/** Product quantization (PQ) — the storage-side half of billion-scale ANN
  * (IVF partitions the corpus, PQ shrinks what each cell stores): split
  * each dim-d vector into `m` subvectors, k-means each subspace
  * independently, and store only the m nearest-centroid indices — m bytes
  * per vector at k ≤ 256 (64-dim float = 256 B → 8 B at m=8, 32×).
  * Queries score compressed codes via ADC (asymmetric distance
  * computation): per query, an m×k lookup table of exact
  * query-subvector · centroid dot products is built once driver-side
  * (m·k doubles — broadcast-sized by construction), and a corpus code's
  * approximate dot is m table lookups, no decode.
  *
  * Scale shape: TRAIN is bounded-sample driver-side (cost a function of
  * m·k, not corpus size — same argument as [[Ivf.train]]); ENCODE is one
  * embarrassingly-parallel pass (the 100 TB corpus becomes 100s-of-GB of
  * codes); ADC scoring is a per-partition scan over codes with the LUT
  * broadcast, reranked through the bounded-heap aggregate
  * ([[Ann.heapRank]]) — only |partitions|×|queries|×k candidate rows ever
  * shuffle, same as the uncompressed operators. Approximate by design:
  * quantization distortion can reorder true neighbors; compose with an
  * exact rerank over the ADC top-R (R > k) when the full vectors are
  * reachable.
  *
  * COSINE-NATIVE, like every similarity operator here: vectors are
  * L2-normalized before training and encoding and queries before LUT
  * construction, so the ADC sum approximates cosine similarity (inner
  * product of unit vectors) — without this, raw-dot ranking favors long
  * vectors and diverges from the exact-cosine oracles.
  */
object Pq {

  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Codebook: per-subspace centroids, laid out
    * cents(((sub*k)+code)*subDim + i). */
  final case class Codebook(m: Int, k: Int, subDim: Int, cents: Array[Double]) {
    require(cents.length == m * k * subDim)
    def centroid(sub: Int, code: Int): Array[Double] =
      cents.slice(((sub * k) + code) * subDim, ((sub * k) + code) * subDim + subDim)
  }

  /** Plain (non-spherical) k-means per subspace over one bounded,
    * deterministic sample — the xxhash64-least `trainSample` corpus
    * vectors (default 256·k), collected once; Lloyd runs driver-side. */
  def train(corpus: DataFrame, vecCol: String, dim: Int, m: Int = 8,
      k: Int = 16, iters: Int = 6, trainSample: Int = 0): Codebook = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    require(k <= 256, "k must fit a byte code")
    val subDim = dim / m
    val n = if (trainSample > 0) trainSample else 256 * k
    val sample = corpus.select(col(vecCol).as("v"))
      .orderBy(xxhash64(col("v"))).limit(n).collect()
      .map(r => unit(r.getSeq[Float](0).toArray.map(_.toDouble)))
    require(sample.length >= k, s"sample ${sample.length} < k=$k")
    val cents = (0 until m).flatMap { sub =>
      val subSample = sample.map(_.slice(sub * subDim, (sub + 1) * subDim))
      kmeans(subSample, subDim, k, iters)
    }.toArray
    Codebook(m, k, subDim, cents)
  }

  /** Lloyd iterations, L2 metric, deterministic: init = first k sample
    * rows, argmin ties break to the lowest code, empty cells keep their
    * centroid (the same conventions as [[Ivf.trainLocal]], minus the
    * sphere). */
  private[similarity] def kmeans(sample: Array[Array[Double]], d: Int,
      k: Int, iters: Int): Array[Double] = {
    var cents: Array[Double] = sample.take(k).flatten
    for (_ <- 1 to iters) {
      val sums = new Array[Double](k * d)
      val counts = new Array[Long](k)
      sample.foreach { v =>
        val best = nearest(cents, v, d, k)
        counts(best) += 1
        var i = 0
        while (i < d) { sums(best * d + i) += v(i); i += 1 }
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents.slice(c * d, c * d + d)
        else sums.slice(c * d, c * d + d).map(_ / counts(c))
      }.flatten
    }
    cents
  }

  private def nearest(cents: Array[Double], v: Array[Double], d: Int, k: Int): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      var dist = 0.0; var i = 0
      while (i < d) { val x = cents(c * d + i) - v(i); dist += x * x; i += 1 }
      if (dist < bestD) { bestD = dist; best = c }
      c += 1
    }
    best
  }

  /** Encode the corpus: (id, codes[m]) — one partition-parallel pass, the
    * codebook a closure-broadcast array (m·k·subDim doubles). */
  def encode(df: DataFrame, vecCol: String, idCol: String,
      cb: Codebook): Dataset[PqCode] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vecCol)).as[(Long, Array[Float])]
      .mapPartitions(rows => rows.map { case (id, raw) => PqCode(id, encodeOne(raw, cb)) })
  }

  /** Encode one vector (executor-side kernel shared with [[IvfPq]]). */
  def encodeOne(raw: Array[Float], cb: Codebook): Array[Byte] = {
    val v = unit(raw.map(_.toDouble))
    val codes = new Array[Byte](cb.m)
    var sub = 0
    while (sub < cb.m) {
      val sv = new Array[Double](cb.subDim)
      var i = 0
      while (i < cb.subDim) { sv(i) = v(sub * cb.subDim + i); i += 1 }
      codes(sub) = nearest(
        java.util.Arrays.copyOfRange(cb.cents, sub * cb.k * cb.subDim,
          (sub + 1) * cb.k * cb.subDim), sv, cb.subDim, cb.k).toByte
      sub += 1
    }
    codes
  }

  /** Reconstruct a vector from its codes (test/diagnostic helper — ADC
    * never decodes). */
  def decode(codes: Array[Byte], cb: Codebook): Array[Float] = {
    val out = new Array[Float](cb.m * cb.subDim)
    var sub = 0
    while (sub < cb.m) {
      val c = cb.centroid(sub, codes(sub) & 0xFF)
      var i = 0
      while (i < cb.subDim) { out(sub * cb.subDim + i) = c(i).toFloat; i += 1 }
      sub += 1
    }
    out
  }

  /** Approximate top-k by ADC inner product over the compressed corpus.
    * `queries` is a broadcast-sized batch by contract (same as every ANN
    * operator here): its vectors come to the driver once to build the
    * per-query LUTs; scoring is then a map over code rows (m lookups +
    * adds per (row, query)) into the bounded-heap rerank — no scored-row
    * shuffle. Output (q_id, rk, n_id) matches [[Ann.bruteTopK]]. */
  def adcTopK(codes: Dataset[PqCode], queries: DataFrame, vecCol: String,
      idCol: String, cb: Codebook, k: Int): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val qs = queries.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    // LUT(q)(sub*k + code) = q_sub · centroid(sub, code)
    val luts = qs.map { case (qid, qraw) =>
      val qv = unit(qraw.map(_.toDouble))
      val lut = new Array[Double](cb.m * cb.k)
      var sub = 0
      while (sub < cb.m) {
        var code = 0
        while (code < cb.k) {
          val c = cb.centroid(sub, code)
          var d = 0.0; var i = 0
          while (i < cb.subDim) { d += qv(sub * cb.subDim + i) * c(i); i += 1 }
          lut(sub * cb.k + code) = d
          code += 1
        }
        sub += 1
      }
      (qid, lut)
    }
    scoredAdc(codes, luts, cb, k)
  }

  /** The production composition: ADC shortlist (top `shortlist` per query
    * over the compressed corpus — cheap, m adds per row) then EXACT cosine
    * rerank of only those candidates against the full vectors. Needed
    * whenever quantization cells are coarser than neighbor gaps: on the
    * clustered test corpus every same-cluster vector shares its codes, so
    * pure ADC ties the whole cluster (measured recall@5 = 0.1) while the
    * shortlist provably contains the cluster and the rerank recovers it
    * (recall@5 ≥ 0.9 asserted at shortlist=100). Candidate-sized vector join — the
    * full corpus vectors never shuffle. */
  def adcRerankTopK(codes: Dataset[PqCode], corpus: DataFrame,
      queries: DataFrame, vecCol: String, idCol: String, cb: Codebook,
      k: Int, shortlist: Int = 100): DataFrame = {
    import graft.functions.VectorFunctions.dotF
    val spark = codes.sparkSession
    val short = adcTopK(codes, queries, vecCol, idCol, cb, shortlist)
      .select(col("q_id"), col("n_id"))
    val cand = short.join(
      corpus.select(col(idCol).cast("long").as("n_id"), col(vecCol).as("n_vec"),
        sqrt(dotF(col(vecCol), col(vecCol))).as("n_nrm")), "n_id")
    val q = broadcast(queries.select(col(idCol).cast("long").as("q_id"),
      col(vecCol).as("q_vec"), sqrt(dotF(col(vecCol), col(vecCol))).as("q_nrm")))
    val exact = cand.join(q, "q_id")
      .select(col("q_id"), col("n_id"),
        (dotF(col("q_vec"), col("n_vec")) / col("q_nrm") / col("n_nrm")).as("cos"))
    Ann.heapRank(exact, k)
  }

  private def scoredAdc(codes: Dataset[PqCode], luts: Array[(Long, Array[Double])],
      cb: Codebook, k: Int): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val scored = codes.mapPartitions { rows =>
      rows.flatMap { r =>
        luts.iterator.collect { case (qid, lut) if qid != r.id =>
          var s = 0.0; var sub = 0
          while (sub < cb.m) { s += lut(sub * cb.k + (r.codes(sub) & 0xFF)); sub += 1 }
          (qid, r.id, s)
        }
      }
    }.toDF("q_id", "n_id", "cos")
    Ann.heapRank(scored, k)
  }
}
