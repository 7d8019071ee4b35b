package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.dedup.DeltaDedup

/** Streaming maintenance of the LSH dedup index — the landed-artifact
  * discipline (q198 fingerprint index, q233 CDX, q234 IVF) applied to
  * the last index with only batch legs after q238: crawl increments
  * arrive as micro-batches and each lands its own FOUR artifact
  * increments (groups, bands, shingles, fps — the
  * [[DeltaDedup.advanceParts]] derivation against the fps lookup AS
  * LANDED BY PREDECESSORS) under idempotent `shard=<batchId>`
  * directories, plus a meta partial carrying the banding params and the
  * batch's max id. A retried batch reads the same predecessor fps set
  * (`shard < batchId`, partition-pruned — its own possibly-half-landed
  * shards excluded) and overwrites byte-equivalent content; nothing
  * lives in streaming state; restart resumes from whatever landed.
  *
  * Ordering contract (the q192/q198 ingest contract, stated not assumed
  * away): batch order must follow ingest order and ids must be monotone
  * across batches — enforced per batch against the landed metas' max id,
  * loudly. Under it, per-batch landing ≡ chained [[DeltaDedup
  * .advanceIndex]] ≡ [[DeltaDedup.buildIndex]] over the union, artifact
  * for artifact (min-id group reps are stable because a later batch can
  * never carry a smaller id), and [[DeltaDedup.deltaPairs]] probes the
  * chain root DIRECTLY — every index read selects its columns, so the
  * shard discovery axis adds directories, never rows.
  *
  * Scale shape per batch: delta-sized fingerprint/signature work + ONE
  * scan of the landed fps chain probed with the broadcast batch
  * fingerprint set; corpus text, bands, and shingles are never read.
  * Compaction = per-artifact shard concat (append-only layout — union
  * merge makes it semantically free, the q236 discipline).
  */
object StreamingLsh {

  private val Artifacts = Seq("groups", "bands", "shingles", "fps", "meta")

  /** Seed the landed chain from a built index at `indexPath` (each
    * artifact copied as its `shard=-1` partial — a production deploy
    * lands the seed once), then drain `deltaStream` (AvailableNow;
    * ORDERED batches, monotone ids); returns the chain root `dir`,
    * probe-ready for [[DeltaDedup.deltaPairs]]. */
  def drain(spark: SparkSession, indexPath: String, deltaStream: DataFrame,
      textCol: String, idCol: String, dir: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(indexPath)
    val fs = src.getFileSystem(conf)
    Artifacts.foreach { a =>
      val dst = new org.apache.hadoop.fs.Path(s"$dir/$a/shard=-1")
      fs.delete(dst, true) // re-seeding (a re-drain) replaces, never nests
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$indexPath/$a"), fs, dst, false, conf)
    }
    val meta = spark.read.parquet(s"$indexPath/meta").head()
    val (numPerm, nBands, k) =
      (meta.getAs[Int]("num_perm"), meta.getAs[Int]("bands"), meta.getAs[Int]("k"))
    val q = deltaStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        import spark.implicits._
        val b = batch.toDF()
        val bounds = b.agg(min(col(idCol)).as("lo"), max(col(idCol)).as("hi")).head()
        val maxAsOf = spark.read.parquet(s"$dir/meta")
          .filter(col("shard") < batchId)
          .agg(max(col("max_id"))).head().getLong(0)
        require(bounds.getLong(0) > maxAsOf,
          s"batch $batchId ids must exceed the landed max id $maxAsOf " +
            "(the ordered-ingest contract that keeps min-id reps stable)")
        val fpsAsOf = spark.read.parquet(s"$dir/fps")
          .filter(col("shard") < batchId).select("fp", "rep")
        val (groupsAdd, bandsAdd, shinglesAdd, fpsAdd) = DeltaDedup
          .advanceParts(fpsAsOf, b, textCol, idCol, numPerm, nBands, k)
        groupsAdd.write.mode("overwrite").parquet(s"$dir/groups/shard=$batchId")
        bandsAdd.write.mode("overwrite").parquet(s"$dir/bands/shard=$batchId")
        shinglesAdd.write.mode("overwrite").parquet(s"$dir/shingles/shard=$batchId")
        fpsAdd.write.mode("overwrite").parquet(s"$dir/fps/shard=$batchId")
        Seq((numPerm, nBands, k, bounds.getLong(1)))
          .toDF("num_perm", "bands", "k", "max_id")
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta/shard=$batchId")
        ()
      }
      .start()
    q.awaitTermination()
    dir
  }
}
