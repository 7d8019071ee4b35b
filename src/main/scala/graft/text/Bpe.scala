package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer training — the step
  * between q55's frequency vocabulary and an actual subword tokenizer
  * (the Sennrich ACL'16 algorithm every GPT/Llama-family tokenizer
  * descends from): repeatedly merge the most frequent adjacent symbol
  * pair until `nMerges` merges are learned.
  *
  * Scale design — iterate on the WORD TABLE, never the corpus: the
  * corpus collapses once into (word, count) — one linear shuffle, result
  * bounded by the VOCABULARY (Heaps-law sublinear in corpus size, ~10⁷
  * rows for a web corpus — a small Spark table, an impossible driver
  * object). Each merge round is then (a) one pair-count aggregation over
  * the word table (map-side combined, pair space bounded by Σ word
  * lengths of the vocabulary), (b) a 1-ROW argmax pulled to the driver
  * (the only thing that ever leaves the cluster), (c) a per-row merge
  * map. The word table caches per round with periodic lineage
  * truncation (the connectedComponents discipline; reliable
  * `checkpointDir` option for cluster runs).
  *
  * Determinism: ties on pair count break lexicographically, so the
  * learned merge list is a pure function of the corpus on any engine —
  * same contract as the md5 Sampling family.
  */
object Bpe {

  /** One learned merge: the adjacent symbol pair, in order. */
  final case class Merge(left: String, right: String)

  /** End-of-word marker (Sennrich convention): "est" inside a word and
    * word-final "est&lt;/w&gt;" learn separate merges. */
  val EndOfWord = "</w>"

  /** Learn `nMerges` merges from the corpus. Stops early when no pair
    * occurs twice. */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      checkpointDir: Option[String] = None): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    // corpus -> (word, count): the ONE corpus-sized pass
    val words = docs
      .select(explode(split(TextAnalysis.normalize(col(textCol)), " ", -1)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    // word -> initial symbol sequence (chars + the end-of-word marker)
    // (syms, count) tuples: codegen-friendly encoders, no private types
    var wt: Dataset[(Seq[String], Long)] = words.as[(String, Long)]
      .map { case (w, c) => ((w.map(_.toString).toList :+ EndOfWord): Seq[String], c) }
      .persist()
    wt.count() // materialize before the loop
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    var round = 0
    var done = false
    while (round < nMerges && !done) {
      // (a) pair counts over the word table — map-side combined
      val best = wt.flatMap { case (syms, cnt) =>
          syms.sliding(2).collect { case Seq(a, b) => ((a, b), cnt) } }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        // (b) the 1-row argmax (count desc, then lexicographic pair)
        .toDF("pair", "n").filter(col("n") >= 2)
        .orderBy(col("n").desc, col("pair._1"), col("pair._2"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val p = best(0).getStruct(0)
        val m = Merge(p.getString(0), p.getString(1))
        merges += m
        // (c) per-row merge map; re-cache, drop the old plan
        val prev = wt
        wt = prev.map { case (syms, cnt) => (applyMerge(syms, m): Seq[String], cnt) }.persist()
        if ((round + 1) % 10 == 0) {
          if (checkpointDir.isDefined) wt = wt.checkpoint()
          else wt = wt.localCheckpoint()
        } else wt.count()
        prev.unpersist()
      }
      round += 1
    }
    wt.unpersist()
    merges.toSeq
  }

  /** One left-to-right pass replacing every non-overlapping adjacent
    * (left, right) with the concatenation — the standard BPE merge. */
  def applyMerge(syms: Seq[String], m: Merge): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == m.left && syms(i + 1) == m.right) {
        out += m.left + m.right; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Segment one word with a learned merge list (applied in training
    * order — the standard greedy BPE encoder). */
  def segmentWord(word: String, merges: Seq[Merge]): Seq[String] =
    merges.foldLeft(word.map(_.toString) :+ EndOfWord: Seq[String])(applyMerge)

  /** Distributed encode: documents to subword-token sequences. The merge
    * list broadcasts (it is nMerges entries — KBs); the encode is a pure
    * per-row kernel, no shuffle. */
  def encodeDocs(spark: SparkSession, docs: DataFrame, textCol: String,
      idCol: String, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { batch =>
        val ms = bc.value
        batch.map { case (id, text) =>
          val toks = TextAnalysis.normalizeString(text).split(" ").iterator
            .filter(_.nonEmpty).flatMap(w => segmentWord(w, ms)).toSeq
          (id, toks)
        }
      }.toDF(idCol, "subwords")
  }
}
