package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Process-local registry of built IVF index paths, keyed by data dir —
  * the query-binding-side stand-in for "the index lives next to the
  * embeddings": the first access builds ([[graft.similarity.Ivf.buildIndex]]),
  * every later query batch in the session probes the same prebuilt,
  * cell-partitioned layout. At 100 TB the path would be a durable lake
  * location written by an ingest job; here it is a temp dir per process. */
object IvfIndexCache {
  private val built = new scala.collection.concurrent.TrieMap[String, String]()

  /** The index path for `dir`, building from `corpus` on first access.
    * nCells=8 here (not the Ivf default 16): cell count should track
    * corpus size (≈ √n is the usual rule; the test corpora are ≤ 50k
    * vectors), and every partition directory costs fixed
    * filesystem-metadata time on this sandbox's FS — fewer, fuller cells
    * are strictly better at this scale. */
  /** Memo key: data dir + CONTENT fingerprint of the embeddings table —
    * an in-process overwrite of the corpus must rebuild the index, never
    * probe a stale one (the fingerprint is a driver-side listing,
    * [[graft.sources.Layout.dirFingerprint]]). */
  private def keyFor(spark: SparkSession, dir: String): String =
    dir + "@" + graft.sources.Layout.dirFingerprint(
      spark, graft.sources.Tables.path(dir, "embeddings"))

  def getOrBuild(spark: SparkSession, dir: String, dim: Int = 64,
      nCells: Int = 8)(corpus: => DataFrame): String =
    built.getOrElseUpdate(keyFor(spark, dir), {
      val path = graft.Scratch.dir("graft_ivf").toString
      graft.similarity.Ivf.buildIndex(corpus, "embedding", "vec_id",
        dim = dim, nCells = nCells, path = path)
      path
    })

  private val builtPq = new scala.collection.concurrent.TrieMap[String, String]()

  /** The IVF+PQ index path for `dir` ([[graft.similarity.IvfPq]] layout:
    * coarse-cell-partitioned parquet carrying PQ codes + full vectors),
    * built from `corpus` on first access. Same nCells rationale as
    * [[getOrBuild]]; m/kCodes are the Pq defaults (8-byte codes, 32
    * codewords per subspace — 32× compression of a 64-float vector). */
  def getOrBuildPq(spark: SparkSession, dir: String, dim: Int = 64,
      nCells: Int = 8, m: Int = 8, kCodes: Int = 32)(corpus: => DataFrame): String =
    builtPq.getOrElseUpdate(keyFor(spark, dir), {
      val path = graft.Scratch.dir("graft_ivfpq").toString
      graft.similarity.IvfPq.buildIndex(corpus, "embedding", "vec_id",
        dim = dim, nCells = nCells, m = m, kCodes = kCodes, path = path)
      path
    })

  private val builtLsh = new scala.collection.concurrent.TrieMap[String, String]()

  /** The standing-corpus LSH dedup index path for `dir`
    * ([[graft.dedup.DeltaDedup]] layout: groups + banded keys + verify
    * shingle sets), built from `corpus` on first access. Keyed on the
    * DOCUMENTS table's content fingerprint — same staleness rule as the
    * ANN indexes. */
  /** `variant` distinguishes indexes over DIFFERENT corpus derivations
    * of the same dir (q147 indexes the plain documents; q226 indexes the
    * planted near-dup corpus) — without it the second caller would
    * silently probe the first caller's index. */
  def getOrBuildLsh(spark: SparkSession, dir: String, variant: String = "")(
      corpus: => DataFrame): String =
    builtLsh.getOrElseUpdate(
      dir + "#" + variant + "@" + graft.sources.Layout.dirFingerprint(
        spark, graft.sources.Tables.path(dir, "documents")), {
        val path = graft.Scratch.dir("graft_lsh").toString
        graft.dedup.DeltaDedup.buildIndex(corpus, "text", "doc_id", path)
        path
      })
}
