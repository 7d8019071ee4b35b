package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental (delta) near-duplicate detection: LSH-join ONLY a new
  * crawl shard against the standing corpus's persisted banded index —
  * the [[graft.similarity.Ivf.appendToIndex]] discipline applied to
  * q28's MinHash pipeline. At 100 TB this is THE dedup cost that
  * matters: re-running [[Dedup.minHashPairs]] over corpus ∪ delta
  * re-shingles, re-signs, and re-pairs the whole corpus per increment,
  * while this operator touches the corpus only through its slim
  * persisted (band, bkey, id) rows — and only the buckets the delta
  * collides into.
  *
  * Contract: `deltaPairs(index(C), D)` returns exactly what
  * `minHashPairs(C ∪ D)` would return RESTRICTED to pairs with at
  * least one side in D (corpus-internal pairs were already reported
  * when C itself was deduped). Same banding, same exact-collapse
  * guards, same exact-Jaccard verify, same recall argument (a pair at
  * J ≥ 0.8 misses all 21×3 bands w.p. ≈ 3e-7); delta docs
  * byte-identical to corpus docs carry identical signatures, collide in
  * EVERY band, and verify at J = 1.0 — the cross-exact path needs no
  * special case. Corpus and delta id spaces must be disjoint (new
  * crawls get fresh ids by construction). One stated nuance: the
  * hot-bucket cap counts a cross-exact duplicate as TWO bucket members
  * (one per side) where the joint run's exact-collapse counts one —
  * sizes can differ by at most the cross-exact count per bucket, which
  * only matters within maxBucket of the cap (a guard threshold, not an
  * answer surface).
  *
  * Scale shape per increment: delta-sized shingle/signature work; ONE
  * broadcastable semi-join prunes the index's band rows to the buckets
  * the delta touches before anything shuffles; candidate pairs form
  * only inside shared buckets (never corpus×corpus — the x-side joins a
  * delta-only y-side); corpus shingle sets load from the index ONLY for
  * ids that survived candidate generation. At lake scale the bands and
  * shingles tables would be bucketed by their join key to make the
  * probe shuffle-free on the index side — the layout note, not a
  * different algorithm.
  */
object DeltaDedup {

  /** Build and persist the standing corpus's LSH index under `path`:
    * `groups/` (id, rep) exact-fingerprint groups, `bands/`
    * (band, bkey, id) LSH bucket keys of exact-collapsed
    * representatives, `shingles/` (id, sh) the 61-bit exact-verify
    * shingle sets of those representatives, `meta/` the banding
    * parameters (so probes can never run with a mismatched banding).
    * One corpus scan; increments never touch the corpus again. */
  def buildIndex(corpus: DataFrame, textCol: String, idCol: String,
      path: String, numPerm: Int = 64, bands: Int = 21, k: Int = 3): Unit = {
    require(numPerm / bands >= 1, s"bands=$bands exceeds numPerm=$numPerm")
    val spark = corpus.sparkSession
    import spark.implicits._
    val groups = Dedup.exactGroups(corpus, textCol, idCol)
    groups.write.mode("overwrite").parquet(s"$path/groups")
    val collapsed = corpus
      .groupBy(graft.text.TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("id"), first(col(textCol)).as("t"))
    val reps = collapsed.select("id", "t")
    reps.select(col("id"), Dedup.minHashSignature(col("t"), numPerm, k).as("sig"))
      .select(col("id"),
        explode(Dedup.lshBands(col("sig"), bands, numPerm / bands)).as("b"))
      .select(col("b.band").as("band"), col("b.bkey").as("bkey"), col("id"))
      .write.mode("overwrite").parquet(s"$path/bands")
    Dedup.hashedShingleSets(reps, "t", "id", k, Dedup.BigPrime)
      .write.mode("overwrite").parquet(s"$path/shingles")
    // the (fp, rep) lookup [[advanceIndex]] probes to attach later
    // arrivals to their standing exact group — one slim row per distinct
    // standing text, the same size class as shingles/
    collapsed.select(col("fp"), col("id").as("rep"))
      .write.mode("overwrite").parquet(s"$path/fps")
    val maxId = corpus.agg(max(col(idCol))).head().getLong(0)
    Seq((numPerm, bands, k, maxId)).toDF("num_perm", "bands", "k", "max_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Append a landed crawl increment to the standing index WITHOUT
    * rebuilding — the [[graft.similarity.Ivf.appendToIndex]] lifecycle
    * leg for the LSH index itself (probing the delta is [[deltaPairs]];
    * this is what makes the delta STANDING for the next increment).
    * Exact rebuild identity under the stated id contract (fresh crawls
    * carry ids ABOVE every standing id — enforced against the index's
    * own recorded max): a delta doc whose normalized fingerprint
    * already stands attaches to that group (its rep keeps the
    * min-id = the standing rep, so groups/ gains one row and
    * bands/shingles/fps gain NOTHING — the rep already bands); a fresh
    * fingerprint exact-collapses within the delta and its rep's band
    * keys, verify shingles, and (fp, rep) row append. Advanced index ≡
    * [[buildIndex]] over corpus ∪ delta, artifact for artifact.
    *
    * Scale shape: delta-sized fingerprint/signature work; the standing
    * side is touched by ONE scan of the slim fps/ table probed with the
    * BROADCAST delta fingerprint set (the q197 discipline) — corpus
    * text, bands, and shingles are never read. */
  def advanceIndex(spark: SparkSession, indexPath: String, delta: DataFrame,
      textCol: String, idCol: String): Unit = {
    import spark.implicits._
    val meta = spark.read.parquet(s"$indexPath/meta").head()
    val (numPerm, nBands, k) =
      (meta.getAs[Int]("num_perm"), meta.getAs[Int]("bands"), meta.getAs[Int]("k"))
    val maxId = meta.getAs[Long]("max_id")
    val bounds = delta.agg(min(col(idCol)).as("lo"), max(col(idCol)).as("hi")).head()
    require(bounds.getLong(0) > maxId,
      s"delta ids must exceed the standing max id $maxId (got ${bounds.getLong(0)}) — " +
        "min-id group reps are only stable under advance when arrivals carry fresh ids")
    val (groupsAdd, bandsAdd, shinglesAdd, fpsAdd) = advanceParts(
      spark.read.parquet(s"$indexPath/fps").select("fp", "rep"),
      delta, textCol, idCol, numPerm, nBands, k)
    groupsAdd.write.mode("append").parquet(s"$indexPath/groups")
    bandsAdd.write.mode("append").parquet(s"$indexPath/bands")
    shinglesAdd.write.mode("append").parquet(s"$indexPath/shingles")
    fpsAdd.write.mode("append").parquet(s"$indexPath/fps")
    Seq((numPerm, nBands, k, math.max(maxId, bounds.getLong(1))))
      .toDF("num_perm", "bands", "k", "max_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/meta")
  }

  /** The advance DERIVATION shared by [[advanceIndex]] (in-place append)
    * and the streamed landing ([[graft.streaming.StreamingLsh]]): given
    * the standing (fp, rep) lookup, a delta's four artifact increments —
    * (groups, bands, shingles, fps) rows to add. Pure function of
    * (standingFps, delta); the standing side is touched by ONE scan
    * probed with the BROADCAST delta fingerprint set. */
  private[graft] def advanceParts(standingFps: DataFrame, delta: DataFrame,
      textCol: String, idCol: String, numPerm: Int, nBands: Int, k: Int):
      (DataFrame, DataFrame, DataFrame, DataFrame) = {
    // r16: the landed intermediates here are LAZY checkpoints — each
    // one's first consumer is a full scan (an aggregate or a broadcast
    // build), so materialization rides that job instead of paying one
    // eager job per table (5 scheduling round-trips per advance; q239
    // pays the chain once per micro-batch).
    val dFp = delta.select(col(idCol).as("id"),
      graft.text.TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .localCheckpoint(false) // delta-sized, consumed twice
    val dColl = dFp.groupBy("fp").agg(min(col("id")).as("did"))
      .localCheckpoint(false)
    // standing attachment: ONE fps scan, delta fingerprints broadcast
    val hit = standingFps
      .join(broadcast(dColl.select("fp")), Seq("fp"), "left_semi")
      .localCheckpoint(false) // attachment-sized (≤ delta distinct fps)
    val groupsAdd = dFp.join(broadcast(hit), Seq("fp"), "left")
      .join(broadcast(dColl), Seq("fp"))
      .select(col("id"), coalesce(col("rep"), col("did")).as("rep"))
    val freshReps = dColl.join(broadcast(hit.select("fp")), Seq("fp"), "left_anti")
      .localCheckpoint(false) // (fp, did) — the delta's new representatives
    // rep text fetched by id join (the collapseExact discipline — never
    // first(t) through an aggregation exchange)
    val repText = delta.select(col(idCol).as("id"), col(textCol).as("t"))
      .join(broadcast(freshReps.select(col("did").as("id"))), "id")
      .localCheckpoint(false)
    val bandsAdd = repText.select(col("id"),
        Dedup.minHashSignature(col("t"), numPerm, k).as("sig"))
      .select(col("id"),
        explode(Dedup.lshBands(col("sig"), nBands, numPerm / nBands)).as("b"))
      .select(col("b.band").as("band"), col("b.bkey").as("bkey"), col("id"))
    val shinglesAdd = Dedup.hashedShingleSets(repText, "t", "id", k, Dedup.BigPrime)
    val fpsAdd = freshReps.select(col("fp"), col("did").as("rep"))
    (groupsAdd, bandsAdd, shinglesAdd, fpsAdd)
  }

  /** Near-dup pairs (id_a, id_b, jaccard), id_a < id_b, between the
    * delta shard and (corpus ∪ delta) — every pair touches the delta.
    * Banding parameters come from the index's own metadata. */
  def deltaPairs(spark: SparkSession, indexPath: String, delta: DataFrame,
      textCol: String, idCol: String, threshold: Double = 0.5,
      maxBucket: Int = 100000): DataFrame = {
    // banding params are identical across a streamed layout's meta
    // shards (the landing copies them through), so any row serves
    val meta = spark.read.parquet(s"$indexPath/meta").head()
    val (numPerm, nBands, k) =
      (meta.getAs[Int]("num_perm"), meta.getAs[Int]("bands"), meta.getAs[Int]("k"))
    // the two delta-sized tables are each consumed several times inside
    // the one output plan (bands + verify sets from reps; expansion +
    // intra self-join from groups) — materialize once, delta-sized
    // r16: lazy for the same reason as advanceParts — every first
    // consumer below is a full scan; the eager forms paid 5 separate
    // materialization jobs before the output plan ever ran
    val deltaGroups = Dedup.exactGroups(delta, textCol, idCol).localCheckpoint(false)
    val deltaReps = delta
      .groupBy(graft.text.TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("id"), first(col(textCol)).as("t"))
      .select("id", "t")
      .localCheckpoint(false)
    val deltaBands = deltaReps
      .select(col("id"), Dedup.minHashSignature(col("t"), numPerm, k).as("sig"))
      .select(col("id"),
        explode(Dedup.lshBands(col("sig"), nBands, numPerm / nBands)).as("b"))
      .select(col("b.band").as("band"), col("b.bkey").as("bkey"), col("id"))
      .localCheckpoint(false) // consumed by the touched-key set AND the cap/join
    // prune the index to buckets the delta touches BEFORE any shuffle —
    // the key set is delta-sized, so this semi-join broadcasts
    val touched = deltaBands.select("band", "bkey").distinct()
    // explicit column selects on every index read: a streamed landing
    // partitions each artifact by shard, and the discovery column must
    // not ride into the unions below
    val idxTouched = spark.read.parquet(s"$indexPath/bands")
      .select("band", "bkey", "id")
      .join(broadcast(touched), Seq("band", "bkey"), "left_semi")
    // combined hot-bucket cap (corpus members + delta members), the q28
    // guard: a boilerplate bucket costs maxBucket² at worst, never more
    val all = Dedup.capBuckets(
      idxTouched.withColumn("is_delta", lit(false))
        .unionByName(deltaBands.withColumn("is_delta", lit(true))),
      Seq("band", "bkey"), maxBucket)
    // pairs form only against a delta y-side: corpus×corpus never exists
    // candidates are delta-proportional (each delta rep meets its bucket
    // peers across nBands buckets) and feed three consumers (both sides
    // of the id set + the verify join) — materialize the slim pair list
    // once instead of re-running the bucket join per consumer
    val candidates = all.alias("x")
      .join(all.filter(col("is_delta")).alias("y"), Seq("band", "bkey"))
      .filter(col("x.id") =!= col("y.id"))
      .select(least(col("x.id"), col("y.id")).as("id_a"),
        greatest(col("x.id"), col("y.id")).as("id_b"))
      .localCheckpoint(false)
    // exact-Jaccard verify: corpus sets load from the index only for
    // candidate survivors; delta sets are computed once, delta-sized
    val candIds = candidates.select(col("id_a").as("id"))
      .unionByName(candidates.select(col("id_b").as("id"))).distinct()
    // candidate-survivor-sized; the verify join consumes it twice (the
    // a-side and b-side of each pair)
    val verifySets = spark.read.parquet(s"$indexPath/shingles")
      .select("id", "sh")
      .join(candIds, "id", "left_semi")
      .unionByName(Dedup.hashedShingleSets(deltaReps, "t", "id", k, Dedup.BigPrime))
      .localCheckpoint(false)
    val repPairs = Dedup.verifyPairsJaccard(candidates, verifySets, threshold)
      .dropDuplicates("id_a", "id_b")
    // member-level expansion: cross pairs over corpus ∪ delta groups,
    // intra (perfect-score) pairs over DELTA groups only — a corpus
    // exact group's internal pairs were reported when C was deduped
    val allGroups = spark.read.parquet(s"$indexPath/groups")
      .select("id", "rep").unionByName(deltaGroups)
    val ga = allGroups.select(col("rep").as("id_a"), col("id").as("m_a"))
    val gb = allGroups.select(col("rep").as("id_b"), col("id").as("m_b"))
    val cross = repPairs.join(ga, "id_a").join(gb, "id_b")
      .select(least(col("m_a"), col("m_b")).as("id_a"),
        greatest(col("m_a"), col("m_b")).as("id_b"), col("jaccard"))
    val intra = deltaGroups.alias("x")
      .join(deltaGroups.alias("y"),
        col("x.rep") === col("y.rep") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        lit(1.0).as("jaccard"))
    cross.unionByName(intra)
  }
}
