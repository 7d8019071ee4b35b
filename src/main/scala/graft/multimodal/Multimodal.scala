package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed view of a multimodal asset: opaque payload + extracted metadata. */
final case class Asset(doc_id: Long, payload: Array[Byte])
final case class AssetMeta(
    doc_id: Long, n_bytes: Int, format: String, feat0: Long, feat1: Long)
/** A resized image payload (dimensions are the REQUESTED geometry; the
  * stub cannot know real pixels). */
final case class ResizedAsset(doc_id: Long, width: Int, height: Int, payload: Array[Byte])
/** One sampled frame of a video payload. */
final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

/** Multimodal (image/audio/video) column plumbing: payloads are opaque
  * `binary` columns with typed metadata; heavy decode runs per-partition in
  * batches (the Scala analog of a Pandas-UDF-over-mapInPandas stage).
  *
  * The actual codec decode is STUBBED deterministically — the image/audio
  * libraries are not in this container. What is real and tested: the binary
  * column schema, magic-byte sniffing as codegen expressions, and the
  * partition-batched `Dataset.mapPartitions` decode stage shape (schema,
  * encoders, partitioning) that a real decoder would drop into.
  */
object Multimodal {

  /** Synthesize deterministic binary payloads from the documents table:
    * a per-modality magic prefix + the UTF-8 text bytes. */
  def synthPayloads(docs: DataFrame): DataFrame = {
    val magic = when(col("doc_id") % 3 === 0, unhex(lit("89504E47"))) // PNG-ish
      .when(col("doc_id") % 3 === 1, unhex(lit("FFD8FFE0")))         // JPEG-ish
      .otherwise(unhex(lit("49443304")))                              // MP3-ish
    docs.select(col("doc_id"), concat(magic, encode(col("text"), "UTF-8")).as("payload"))
  }

  /** Magic-byte format sniff — pure expression, codegen'd. */
  def sniffFormat(df: DataFrame): DataFrame =
    df.withColumn("format",
      when(hex(substring(col("payload"), 1, 4)) === "89504E47", "png")
        .when(hex(substring(col("payload"), 1, 3)) === "FFD8FF", "jpeg")
        .when(hex(substring(col("payload"), 1, 3)) === "494433", "mp3")
        .otherwise("unknown"))

  /** The decode/feature-extract stage: partition-batched, typed. A real
    * implementation would decode `payload` with an image/audio codec here;
    * this stub derives two deterministic pseudo-features from the bytes so
    * the full pipeline (schema → batches → features) is executable and
    * testable. */
  def extractFeatures(spark: SparkSession, assets: DataFrame): Dataset[AssetMeta] = {
    import spark.implicits._
    assets.select(col("doc_id"), col("payload")).as[Asset]
      .mapPartitions { batch =>
        batch.map { a =>
          val fmt =
            if (a.payload.length >= 4 &&
              (a.payload(0) & 0xFF) == 0x89 && a.payload(1) == 'P') "png"
            else if (a.payload.length >= 3 && (a.payload(0) & 0xFF) == 0xFF &&
              (a.payload(1) & 0xFF) == 0xD8) "jpeg"
            else if (a.payload.length >= 3 && a.payload(0) == 'I' &&
              a.payload(1) == 'D' && a.payload(2) == '3') "mp3"
            else "unknown"
          // ??? real decode goes here; deterministic fake features instead:
          val f0 = a.payload.foldLeft(1125899906842597L)((h, b) => 31 * h + (b & 0xFF))
          val f1 = a.payload.length.toLong * 2654435761L
          AssetMeta(a.doc_id, a.payload.length, fmt, f0, f1)
        }
      }
  }

  /** Resize stage: one-to-one partition-batched transform producing a new
    * binary column plus the output geometry — the stage shape a real
    * image codec (decode → scale → re-encode) drops into. The stub
    * deterministically subsamples the payload bytes past the magic prefix
    * to the byte budget w*h/64, preserving the magic so the result still
    * format-sniffs correctly. */
  def resizeImages(spark: SparkSession, assets: DataFrame,
      w: Int, h: Int): Dataset[ResizedAsset] = {
    import spark.implicits._
    val budget = math.max(1, w * h / 64)
    assets.select(col("doc_id"), col("payload")).as[Asset]
      .mapPartitions { batch =>
        batch.map { a =>
          val (magic, body) = a.payload.splitAt(math.min(4, a.payload.length))
          val out =
            if (body.length <= budget) body
            else Array.tabulate(budget)(i => body(i * body.length / budget))
          ResizedAsset(a.doc_id, w, h, magic ++ out)
        }
      }
  }

  /** Frame-sampling stage: the one-to-MANY batched transform (the
    * flatMap-shaped plumbing a real video demuxer needs — each input row
    * fans out to a bounded row set). The stub treats the payload past the
    * magic as fixed-size pseudo-frames and emits every `everyN`-th. */
  def sampleFrames(spark: SparkSession, assets: DataFrame,
      frameBytes: Int = 64, everyN: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    require(frameBytes > 0 && everyN > 0)
    assets.select(col("doc_id"), col("payload")).as[Asset]
      .mapPartitions { batch =>
        batch.flatMap { a =>
          val body = a.payload.drop(math.min(4, a.payload.length))
          body.grouped(frameBytes).zipWithIndex
            .filter(_._2 % everyN == 0)
            .map { case (bytes, idx) => Frame(a.doc_id, idx, bytes) }
        }
      }
  }
}
