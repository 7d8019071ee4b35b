package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{dotF, nearestCentroid}

/** IVF+PQ — the composed billion-scale ANN index (the layout FAISS calls
  * IVFPQ, re-expressed as a partitioned parquet dataset): [[Ivf]]'s coarse
  * quantizer prunes WHICH cells a query reads (partition pruning at
  * file-listing time), [[Pq]]'s product codes shrink WHAT each cell
  * stores and make in-cell scoring m table lookups per row.
  *
  * Index layout at `path`: `data/` = (n_id, n_vec, n_nrm, codes)
  * PARTITIONED BY cell; `centroids.txt` (coarse) + `codebook.txt` (PQ),
  * both driver-sized text. The full vectors ride along in the same
  * partitions for the exact rerank — at true corpus scale the codes
  * column is what ADC scans (m bytes/row hot), and the vector column is
  * touched only for the shortlist (columnar parquet reads it lazily, so
  * the 32× win is real even co-located).
  *
  * Probe = driver-side nearest-nProbe cells per query (queries are
  * broadcast-sized by contract, centroids driver-sized by construction —
  * zero Spark jobs), one partition-pruned scan of the UNION of probed
  * cells, ADC shortlist, exact cosine rerank of candidates only
  * ([[Pq.adcRerankTopK]]). Recall = IVF's cell recall × PQ's shortlist
  * recall; both measured on the clustered corpus in the specs.
  */
object IvfPq {

  /** Train both quantizers (each on its own bounded deterministic sample),
    * assign + encode the corpus in ONE pass, write cell-partitioned.
    * Returns (coarse centroids, PQ codebook). */
  def buildIndex(corpus: DataFrame, vecCol: String, idCol: String, dim: Int,
      nCells: Int, m: Int = 8, kCodes: Int = 32, path: String,
      iters: Int = 4, writeTasks: Int = 0): (Array[Double], Pq.Codebook) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = Ivf.train(corpus, vecCol, dim, nCells, iters)
    val cb = Pq.train(corpus, vecCol, dim, m, kCodes, iters + 2)
    val tasks = if (writeTasks > 0) writeTasks else nCells
    corpus.select(col(idCol).cast("long").as("n_id"), col(vecCol).as("n_vec"),
        sqrt(dotF(col(vecCol), col(vecCol))).as("n_nrm"),
        nearestCentroid(col(vecCol), cents, dim).as("cell"))
      .as[(Long, Array[Float], Double, Int)]
      .mapPartitions(rows => rows.map { case (id, v, nrm, cell) =>
        (id, v, nrm, Pq.encodeOne(v, cb), cell) })
      .toDF("n_id", "n_vec", "n_nrm", "codes", "cell")
      .repartitionByRange(tasks, col("cell"), col("n_id"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/data")
    writeText(spark, s"$path/centroids.txt",
      cents.grouped(dim).map(_.mkString(",")).mkString("\n"))
    writeText(spark, s"$path/codebook.txt",
      s"${cb.m} ${cb.k} ${cb.subDim}\n" +
        cb.cents.grouped(cb.subDim).map(_.mkString(",")).mkString("\n"))
    (cents, cb)
  }

  /** Incremental composed-index maintenance: assign + PQ-encode NEW
    * vectors with the index's EXISTING coarse centroids and codebooks,
    * dynamic-partition append into the cell layout — the daily-ingest
    * path for the billion-scale index (quantizers retrain rarely;
    * day-over-day data keeps the trained geometry), mirroring
    * [[Ivf.appendToIndex]]. Only the cells the batch lands in gain
    * files; existing data is untouched; probes see the union
    * immediately (ADC tables derive from the persisted codebook, which
    * is unchanged). Retrain + [[buildIndex]] when drift warrants it. */
  def appendToIndex(newCorpus: DataFrame, vecCol: String, idCol: String,
      path: String, writeTasks: Int = 0): Unit = {
    val spark = newCorpus.sparkSession
    import spark.implicits._
    val (cents, dim) = Ivf.loadCentroids(spark, path)
    val cb = loadCodebook(spark, path)
    val tasks = if (writeTasks > 0) writeTasks else cents.length / dim
    newCorpus.select(col(idCol).cast("long").as("n_id"), col(vecCol).as("n_vec"),
        sqrt(dotF(col(vecCol), col(vecCol))).as("n_nrm"),
        nearestCentroid(col(vecCol), cents, dim).as("cell"))
      .as[(Long, Array[Float], Double, Int)]
      .mapPartitions(rows => rows.map { case (id, v, nrm, cell) =>
        (id, v, nrm, Pq.encodeOne(v, cb), cell) })
      .toDF("n_id", "n_vec", "n_nrm", "codes", "cell")
      .repartitionByRange(tasks, col("cell"), col("n_id"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/data")
  }

  def loadCodebook(spark: SparkSession, path: String): Pq.Codebook = {
    val lines = readLines(spark, s"$path/codebook.txt")
    val Array(m, k, subDim) = lines.head.trim.split(" ").map(_.toInt)
    Pq.Codebook(m, k, subDim,
      lines.tail.filter(_.nonEmpty).flatMap(_.split(",").map(_.toDouble)))
  }

  /** Partition-pruned ADC probe: read ONLY the union of the queries'
    * nProbe nearest cells, shortlist by ADC, exact-rerank candidates. */
  def probeTopK(spark: SparkSession, path: String, queries: DataFrame,
      vecCol: String, idCol: String, k: Int, nProbe: Int = 4,
      shortlist: Int = 100): DataFrame = {
    import spark.implicits._
    val centLines = readLines(spark, s"$path/centroids.txt").filter(_.nonEmpty)
    val cents = centLines.flatMap(_.split(",").map(_.toDouble))
    val dim = centLines.head.split(",").length
    val nCells = cents.length / dim
    val cb = loadCodebook(spark, path)

    // nearest nProbe cells per query, driver-side (queries broadcast-sized
    // by contract; max-dot over L2-normalized centroids = max cosine)
    val qvecs = queries.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect()
    val cells = qvecs.flatMap { case (_, qv) =>
      (0 until nCells).map { c =>
        var d = 0.0; var i = 0
        while (i < dim) { d += cents(c * dim + i) * qv(i); i += 1 }
        (c, d)
      }.sortBy { case (c, d) => (-d, c) }.take(nProbe).map(_._1)
    }.distinct.sorted

    val data = spark.read.parquet(s"$path/data")
      .filter(col("cell").isInCollection(cells.map(Int.box)))
    val codes = data.select(col("n_id").as("id"), col("codes")).as[PqCode]
    Pq.adcRerankTopK(codes,
      data.select(col("n_id").as(idCol), col("n_vec").as(vecCol)),
      queries, vecCol, idCol, cb, k, shortlist)
  }

  private def writeText(spark: SparkSession, file: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readLines(spark: SparkSession, file: String): Array[String] = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
    finally in.close()
  }
}
