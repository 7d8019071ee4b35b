package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{dotF, nearestCentroid}

/** IVF (inverted-file) approximate nearest-neighbor search — the coarse-
  * quantizer scale path alongside hyperplane LSH ([[Ann.lshTopK]]), with
  * the index lifecycle a 100 TB corpus actually needs:
  *
  *  1. TRAIN a spherical k-means quantizer on a BOUNDED deterministic
  *     sample (`trainSample` vectors, default 256×nCells — the standard
  *     coarse-quantizer practice: centroid quality depends on sample
  *     density per cell, not corpus size, so the driver-side Lloyd loop
  *     costs the same at 100 TB as at 100 MB and runs zero sequential
  *     Spark jobs; only the one bounded sample collect touches the
  *     cluster).
  *  2. BUILD ([[buildIndex]]): assign every corpus vector to its nearest
  *     cell in one codegen pass
  *     ([[graft.functions.VectorFunctions.nearestCentroid]]) and write the
  *     corpus WITH its cell assignment and precomputed norm, partitioned
  *     by cell, centroids alongside — paid once, reused by every query
  *     batch.
  *  3. PROBE ([[probeTopK]]): each query batch reads ONLY its probed
  *     cells — the probe-cell set becomes a literal partition filter, so
  *     the scan is partition-pruned at file-listing time (at most
  *     |queries|×nProbe of nCells directories are even listed). Exact
  *     cosine rerank inside the probed cells through the bounded-heap
  *     aggregate ([[Ann.heapRank]]) — no scored-row shuffle.
  *
  * [[topK]] is the one-shot convenience (train + assign in-flight + probe,
  * no index written) for exploratory use; any repeated-query workload
  * should build the index once and probe it.
  *
  * Approximate by design: a true neighbor living outside the probed cells
  * is missed. Raise `nProbe` toward `nCells` to trade cost for recall
  * (nProbe = nCells degenerates to exact brute force).
  *
  * WHEN IVF HELPS — honestly: on a near-isotropic corpus (this repo's
  * synthetic embeddings: pairwise cosines ≤ 0.6, no cluster structure)
  * measured recall@5 ≈ nProbe/nCells (0.6 at 8/16 — see
  * examples/IvfProbe), because neighbors at cos ≈ 0.5 scatter across
  * cells. Real text/image embedding corpora are strongly clustered, which
  * is exactly the structure the quantizer exploits; there IVF reaches
  * high recall at nProbe ≪ nCells. The q46 correctness gate therefore
  * plants direction-identical neighbors (guaranteed same cell — found at
  * any nProbe) to pin the machinery, while IvfProbe documents the
  * natural-data recall curve.
  */
object Ivf {

  private def normalized(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Spherical k-means centroids, row-major (k × dim), L2-normalized (so
    * max-dot assignment = max-cosine). Deterministic: the training sample
    * is the `trainSample` corpus vectors with the smallest xxhash64 (one
    * bounded collect — sample size is a function of nCells, NOT corpus
    * size), init takes the first nCells of it, and the Lloyd loop is plain
    * deterministic driver-side arithmetic. Empty cells keep their previous
    * centroid. */
  def train(corpus: DataFrame, vecCol: String, dim: Int, nCells: Int,
      iters: Int = 4, trainSample: Int = 0): Array[Double] = {
    val n = if (trainSample > 0) trainSample else 256 * nCells
    val sample = corpus.select(col(vecCol).as("v"))
      .orderBy(xxhash64(col("v")))
      .limit(n)
      .collect()
      .map(r => r.getSeq[Float](0).toArray.map(_.toDouble))
    require(sample.length >= nCells,
      s"corpus has ${sample.length} vectors < nCells=$nCells")
    trainLocal(sample, dim, nCells, iters)
  }

  /** Lloyd iterations over an in-memory sample. Assignment tie-break:
    * first cell with the maximal dot (same rule as the codegen
    * NearestCentroid kernel). */
  private[similarity] def trainLocal(sample: Array[Array[Double]], dim: Int,
      nCells: Int, iters: Int): Array[Double] = {
    var cents: Array[Double] = sample.take(nCells).map(normalized).flatten
    for (_ <- 1 to iters) {
      val sums = new Array[Double](nCells * dim)
      val counts = new Array[Long](nCells)
      sample.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < nCells) {
          var d = 0.0; var i = 0
          while (i < dim) { d += cents(c * dim + i) * v(i); i += 1 }
          if (d > bestDot) { bestDot = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best * dim + i) += v(i); i += 1 }
      }
      cents = Array.tabulate(nCells) { c =>
        if (counts(c) == 0) cents.slice(c * dim, c * dim + dim) // keep old
        else normalized(sums.slice(c * dim, c * dim + dim))
      }.flatten
    }
    cents
  }

  /** Train the quantizer and persist the index at `path`: the corpus as
    * (n_id, n_vec, n_nrm) parquet PARTITIONED BY its cell assignment
    * (`path/data`) + the centroids (`path/centroids`). This is the
    * write-once artifact the scaladoc's 100 TB story needs — every later
    * query batch probes it with partition pruning instead of re-training
    * and re-assigning. Returns the centroids. */
  /** @param writeTasks parallelism of the index write (0 ⇒ nCells, one
    *   file per cell — right while a cell fits one file; at corpus scale
    *   pass a multiple of the cluster's cores and each cell spans several
    *   cell-contiguous files). Range-partitioning on (cell, id) with an
    *   EXPLICIT count keeps file creation parallel and bounds files per
    *   task at 1-2 (hash-on-cell caps parallelism at nCells; letting AQE
    *   coalesce the tiny shuffle degenerates to ONE task serially opening
    *   a parquet writer per cell — measured 4× the whole build cost). */
  def buildIndex(corpus: DataFrame, vecCol: String, idCol: String, dim: Int,
      nCells: Int, path: String, iters: Int = 4,
      trainSample: Int = 0, writeTasks: Int = 0): Array[Double] = {
    val spark = corpus.sparkSession
    val cents = train(corpus, vecCol, dim, nCells, iters, trainSample)
    val tasks = if (writeTasks > 0) writeTasks else nCells
    assign(corpus, vecCol, idCol, cents, dim)
      .repartitionByRange(tasks, col("cell"), col("n_id"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/data")
    writeCentroids(spark, s"$path/centroids.txt", cents, dim)
    cents
  }

  /** The index row shape — (n_id, n_vec, n_nrm, cell) with the cell from
    * one codegen nearest-centroid pass. Shared by [[buildIndex]],
    * [[appendToIndex]] and the streamed landing
    * ([[graft.streaming.StreamingIvf]]): a per-row pure function of
    * (vector, centroids), which is what makes every ingest path land
    * byte-equivalent rows for the same input. */
  def assign(corpus: DataFrame, vecCol: String, idCol: String,
      cents: Array[Double], dim: Int): DataFrame =
    corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"),
      sqrt(dotF(col(vecCol), col(vecCol))).as("n_nrm"),
      nearestCentroid(col(vecCol), cents, dim).as("cell"))

  /** Centroids are a nCells×dim double array — driver-sized by definition.
    * Plain text via the Hadoop FS API (works on any DFS the data dir
    * lives on) so index open/close costs no Spark job. */
  def writeCentroids(spark: SparkSession, file: String,
      cents: Array[Double], dim: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try {
      val w = new java.io.PrintWriter(out)
      cents.grouped(dim).foreach(row => w.println(row.mkString(",")))
      w.flush()
    } finally out.close()
  }

  /** Incremental index maintenance: assign NEW corpus vectors with the
    * index's EXISTING centroids and append them to the cell-partitioned
    * layout — the daily-ingest path (quantizers are retrained rarely;
    * day-over-day data keeps the trained geometry). Dynamic partition
    * append: only the cells the new batch lands in gain files; existing
    * data is untouched, and probes see the union immediately. Retrain +
    * [[buildIndex]] from scratch when drift warrants it. */
  def appendToIndex(newCorpus: DataFrame, vecCol: String, idCol: String,
      path: String, writeTasks: Int = 0): Unit = {
    val spark = newCorpus.sparkSession
    val (cents, dim) = loadCentroids(spark, path)
    val nCells = cents.length / dim
    val tasks = if (writeTasks > 0) writeTasks else nCells
    assign(newCorpus, vecCol, idCol, cents, dim)
      .repartitionByRange(tasks, col("cell"), col("n_id"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/data")
  }

  /** Centroids persisted by [[buildIndex]], row-major, plus dim. */
  def loadCentroids(spark: SparkSession, path: String): (Array[Double], Int) = {
    val p = new org.apache.hadoop.fs.Path(s"$path/centroids.txt")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
      finally in.close()
    val rows = lines.filter(_.nonEmpty).map(_.split(",").map(_.toDouble))
    (rows.flatten, rows.head.length)
  }

  /** Approximate top-k against a prebuilt index: the probe-cell set (at
    * most |queries|×nProbe of nCells values — a bounded driver-side
    * collect by construction) becomes a literal IN filter on the
    * partition column, so the scan lists and reads ONLY the probed cell
    * directories. Exact-cosine rerank through per-partition bounded heaps.
    * Output (q_id, rk, n_id) matches [[Ann.bruteTopK]]. */
  def probeTopK(spark: SparkSession, path: String, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, nProbe: Int = 6): DataFrame = {
    val (cents, dim) = loadCentroids(spark, path)
    // persist: the cells-collect below materializes the probe table, and
    // the score join re-reads it from cache instead of re-running the
    // centroid cross + window (query batches are broadcast-sized by
    // contract, so this cache is small by construction)
    val probes = probeAssignments(queries, vecCol, idCol, cents, dim, nProbe)
      .persist()
    val cells = probes.select("cell").distinct().collect()
      .map(_.getInt(0)).sorted
    val data = spark.read.parquet(s"$path/data")
      .filter(col("cell").isInCollection(cells.map(Int.box)))
    scoreAndRank(data, probes, k)
  }

  /** One-shot approximate top-k (no persisted index): train on the bounded
    * sample, assign the corpus in-flight, probe. For repeated query
    * batches use [[buildIndex]] + [[probeTopK]] — this path re-assigns the
    * corpus per call. */
  def topK(corpus: DataFrame, queries: DataFrame, vecCol: String,
      idCol: String, k: Int, dim: Int, nCells: Int = 16, nProbe: Int = 6,
      iters: Int = 4): DataFrame = {
    val cents = train(corpus, vecCol, dim, nCells, iters)
    val data = assign(corpus, vecCol, idCol, cents, dim)
    val probes = probeAssignments(queries, vecCol, idCol, cents, dim, nProbe)
    scoreAndRank(data, probes, k)
  }

  /** (q_id, q_vec, q_nrm, cell) — each query's nProbe closest cells, from
    * a broadcast cross with the tiny (nCells-row) centroid table. */
  private def probeAssignments(queries: DataFrame, vecCol: String,
      idCol: String, cents: Array[Double], dim: Int, nProbe: Int): DataFrame = {
    val cellDf = centroidsDf(queries.sparkSession, cents, dim)
    val probeW = Window.partitionBy(col("q_id"))
      .orderBy(col("c_dot").desc, col("cell"))
    queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        sqrt(dotF(col(vecCol), col(vecCol))).as("q_nrm"))
      .crossJoin(broadcast(cellDf))
      .withColumn("c_dot", dotF(col("q_vec"), col("c_vec")))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("q_nrm"), col("cell"))
  }

  /** Equi-join corpus cells to broadcast query probes, exact cosine, heap
    * top-k ([[Ann.heapRank]] — no scored-row shuffle). */
  private def scoreAndRank(data: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val scored = data.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (dotF(col("q_vec"), col("n_vec")) / col("q_nrm") / col("n_nrm")).as("cos"))
    Ann.heapRank(scored, k)
  }

  /** (cell, c_vec float array) rows from a row-major centroid array. */
  private def centroidsDf(spark: SparkSession, cents: Array[Double], dim: Int): DataFrame = {
    import spark.implicits._
    cents.grouped(dim).zipWithIndex
      .map { case (v, i) => (i, v.map(_.toFloat)) }
      .toSeq.toDF("cell", "c_vec")
  }
}
