package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed view of a multimodal asset: opaque payload + extracted metadata. */
final case class Asset(doc_id: Long, payload: Array[Byte])

/** Decoded metadata: container stats (n_bytes, format from magic bytes) plus
  * the real decoded geometry when the payload is a decodable image
  * (width/height/channels from the JDK codec; -1 when not an image), plus
  * two deterministic payload-hash features for non-decodable modalities. */
final case class AssetMeta(
    doc_id: Long, n_bytes: Int, format: String,
    width: Int, height: Int, channels: Int, f0: Long, f1: Long)

/** A resized image payload. For decodable images these are the REAL output
  * pixel dimensions (the payload is a re-encoded resample); for opaque
  * payloads they echo the requested geometry over a byte-budget subsample. */
final case class ResizedAsset(doc_id: Long, width: Int, height: Int, payload: Array[Byte])

/** One sampled frame of a video payload. */
final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

/** Zero-dependency image codec over JDK `javax.imageio` (PNG/JPEG/BMP read
  * and write ship with the JRE) — the real decode/resample/encode kernel the
  * partition-batched stages below run per executor. Headless-safe: ImageIO
  * never touches a display, and the in-memory cache avoids per-decode tmp
  * files on executor disks.
  *
  * Scale note: this is a CPU-bound per-row kernel with no shuffle — it
  * parallelizes embarrassingly across partitions. At 100 TB the only tuning
  * is partition sizing (`spark.sql.files.maxPartitionBytes`) so one task's
  * batch of payloads fits in memory.
  */
object ImageCodec {
  System.setProperty("java.awt.headless", "true")
  javax.imageio.ImageIO.setUseCache(false)

  import java.awt.image.BufferedImage
  import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
  import javax.imageio.ImageIO

  /** Decode any ImageIO-supported container (PNG/JPEG/BMP/GIF/WBMP in a
    * stock JRE). None when the bytes are not a decodable image. */
  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Raster band count of a decoded image (3 = RGB, 4 = +alpha). */
  def channels(img: BufferedImage): Int = img.getRaster.getNumBands

  /** Encode to `fmt` ("png" | "jpeg" | "bmp"). JPEG/BMP writers reject
    * alpha, so flatten to RGB for those. */
  def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val writable =
      if (fmt != "png" && img.getColorModel.hasAlpha) flatten(img) else img
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(writable, fmt, out), s"no ImageIO writer for $fmt")
    out.toByteArray
  }

  /** Real resample to exactly (w, h) via an AWT Graphics2D draw with
    * bilinear interpolation — deterministic given the same input pixels. */
  def resample(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val kind = if (img.getColorModel.hasAlpha) BufferedImage.TYPE_INT_ARGB
      else BufferedImage.TYPE_INT_RGB
    val out = new BufferedImage(w, h, kind)
    val g = out.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    out
  }

  private def flatten(img: BufferedImage): BufferedImage = {
    val out = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.drawImage(img, 0, 0, null)
    g.dispose()
    out
  }
}

/** Multimodal (image/audio/video) column plumbing: payloads are opaque
  * `binary` columns with typed metadata; heavy decode runs per-partition in
  * batches (the Scala analog of a Pandas-UDF-over-mapInPandas stage).
  *
  * Image decode/resample/re-encode is REAL (JDK `javax.imageio` via
  * [[ImageCodec]]: PNG, JPEG, BMP). Audio/video codecs are not in a stock
  * JRE, so those payloads flow through the same stages as opaque bytes with
  * deterministic hash features — the honest boundary of a zero-dependency
  * container, and the stage shape a real demuxer drops into.
  */
object Multimodal {

  /** Codec-stage parallelism guard: every kernel below is per-row CPU
    * work (JDK image/audio encode+decode) whose input often arrives at
    * FILE parallelism — the test corpora are one small parquet file
    * (one row group ⇒ one scan task), and a streaming micro-batch is
    * one file — so the whole codec stage would run on one core while
    * the rest idle. One slim-row shuffle buys a cores-wide map stage;
    * every consumer keys or aggregates by doc_id, so row placement is
    * free to change. A many-file production layout already carries
    * ≥ cores partitions and passes through untouched (the
    * EventsStream.rebalanced contract applied to the codec stages). */
  private def balanced(df: DataFrame): DataFrame =
    graft.ops.Par.balanced(df)

  /** Synthesize deterministic binary payloads from the documents table:
    * a per-modality magic prefix + the UTF-8 text bytes. These are NOT
    * decodable images (see [[synthImages]] for real ones) — they exercise
    * the opaque-payload path: sniffing, hashing, byte-budget resize. */
  def synthPayloads(docs: DataFrame): DataFrame = {
    val magic = when(col("doc_id") % 3 === 0, unhex(lit("89504E47"))) // PNG-ish
      .when(col("doc_id") % 3 === 1, unhex(lit("FFD8FFE0")))         // JPEG-ish
      .otherwise(unhex(lit("49443304")))                              // MP3-ish
    docs.select(col("doc_id"), concat(magic, encode(col("text"), "UTF-8")).as("payload"))
  }

  /** Requested geometry and pixel type of a [[synthImages]] asset, as pure
    * functions of doc_id — which is what makes the REAL decode of q66
    * oracle-checkable: DuckDB predicts the dims arithmetically, Spark
    * recovers them by actually decoding the pixels. */
  def synthWidth(id: Long): Int = 8 + (id % 9).toInt
  def synthHeight(id: Long): Int = 8 + ((id / 9) % 7).toInt
  def synthFormat(id: Long): String =
    (id % 3) match { case 0 => "png"; case 1 => "jpeg"; case _ => "bmp" }
  def synthHasAlpha(id: Long): Boolean = id % 6 == 0 // alpha only on PNGs

  /** Generate REAL images (decodable PNG/JPEG/BMP bytes) per document id:
    * deterministic per-pixel colors, dims/format/alpha from the synth*
    * functions above. Partition-batched like every codec stage here. */
  def synthImages(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    import java.awt.image.BufferedImage
    balanced(docs.select(col("doc_id"))).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val (w, h) = (synthWidth(id), synthHeight(id))
          val kind = if (synthHasAlpha(id)) BufferedImage.TYPE_INT_ARGB
            else BufferedImage.TYPE_INT_RGB
          val img = new BufferedImage(w, h, kind)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              // deterministic pseudo-color per (id, x, y)
              val m = id * 1103515245L + x * 12345L + y * 2654435761L
              val rgb = (m & 0xFFFFFF).toInt | 0xFF000000
              img.setRGB(x, y, rgb)
              x += 1
            }
            y += 1
          }
          Asset(id, ImageCodec.encode(img, synthFormat(id)))
        }
      }.toDF()
  }

  /** Per-image augmentation statistics row — see [[augmentImages]]. */
  final case class AugStat(doc_id: Long, aug_w: Int, aug_h: Int,
    flip: Boolean, ox: Int, oy: Int, sum_rgb: Long, wsum: Long)

  /** First 60 bits of md5("salt:v") mod m — the JVM-side mirror of
    * [[graft.ops.Sampling.shard]], so per-image augmentation draws are
    * the same pure md5 functions every other sampling decision uses. */
  private def md5Mod(salt: String, v: Long, m: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$v".getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString.take(15)
    (java.lang.Long.parseLong(hex, 16) % m).toInt
  }

  /** Deterministic per-epoch image augmentation (q184) — the vision-
    * training transform pass, with every random choice a pure md5
    * function of (epoch, id) so any worker (or a resumed job, or the
    * oracle) re-derives the identical augmented pixel for free: crop
    * (w−2)×(h−2) at offset (ox, oy) ∈ {0,1,2}², then horizontal flip
    * on a fair md5 coin. The augmented image is RE-ENCODED to PNG and
    * RE-DECODED before its statistics are read — the full codec
    * roundtrip, not just an in-memory transform — and the surfaced
    * sums are exact longs: sum_rgb = Σ(r+g+b) and the POSITION-WEIGHTED
    * wsum = Σ(131·x + y)(r+g+b), which is flip-asymmetric on purpose (a
    * plain sum cannot see an orientation bug). On the synthImages
    * corpus every augmented pixel is a pure integer function of
    * (id, x, y), so DuckDB predicts both sums arithmetically while
    * Spark genuinely decodes, crops, flips, encodes, and decodes again
    * (the q66/q111 trick applied to a TRANSFORM). Lossless formats only
    * on the oracle path (PNG/BMP — JPEG pixels are codec-defined).
    * Per-row JDK-codec kernel in mapPartitions (the house multimodal
    * rule: no Catalyst expression decodes PNG). */
  def augmentImages(spark: SparkSession, assets: DataFrame,
      epoch: String): Dataset[AugStat] = {
    import spark.implicits._
    import java.awt.image.BufferedImage
    assets.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = ImageCodec.decode(bytes).getOrElse(
            throw new IllegalArgumentException(s"undecodable image for doc $id"))
          val (w, h) = (img.getWidth, img.getHeight)
          require(w >= 3 && h >= 3, s"image $id too small to crop ($w x $h)")
          val flip = md5Mod(s"augf:$epoch", id, 2) == 1
          val ox = md5Mod(s"augx:$epoch", id, 3)
          val oy = md5Mod(s"augy:$epoch", id, 3)
          val (cw, ch) = (w - 2, h - 2)
          val out = new BufferedImage(cw, ch, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < ch) {
            var x = 0
            while (x < cw) {
              val sx = if (flip) ox + (cw - 1 - x) else ox + x
              out.setRGB(x, y, img.getRGB(sx, oy + y))
              x += 1
            }
            y += 1
          }
          val dec = ImageCodec.decode(ImageCodec.encode(out, "png")).get
          var sum = 0L; var wsum = 0L
          y = 0
          while (y < ch) {
            var x = 0
            while (x < cw) {
              val rgb = dec.getRGB(x, y)
              val s3 = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)).toLong
              sum += s3
              wsum += (131L * x + y) * s3
              x += 1
            }
            y += 1
          }
          AugStat(id, cw, ch, flip, ox, oy, sum, wsum)
        }
      }
  }

  /** Twin images for near-dup detection: `nPairs` pairs (base+2k,
    * base+2k+1), the twin pixel-identical to its base except ONE pixel
    * (0,0) with its color xor'd by 0x808080 — a perceptual near-dup the
    * aHash must catch. Colors follow the [[synthImages]] formula keyed
    * by the BASE id, so the q66 arithmetic-oracle trick extends to
    * PIXELS: every gray value, the mean, and the hash bits are pure
    * integer functions of (baseId, x, y) an oracle reproduces, while
    * Spark recovers them by genuinely decoding the PNG. */
  def synthTwinImages(spark: SparkSession, nPairs: Int, base: Long,
      idOffset: Long = 0L): DataFrame = {
    import spark.implicits._
    import java.awt.image.BufferedImage
    spark.range(0, nPairs * 2L).as[Long].mapPartitions { idxs =>
      idxs.map { i =>
        // idOffset splits asset identity from pixel identity: a nonzero
        // offset mints NEW ids carrying the SAME pixel streams — the
        // guaranteed-attachment plant the delta-ingest row (q192) needs
        val id = base + idOffset + i
        val baseId = base + (i / 2) * 2
        val twin = i % 2 == 1
        val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val m = baseId * 1103515245L + x * 12345L + y * 2654435761L
            var rgb = (m & 0xFFFFFF).toInt
            if (twin && x == 0 && y == 0) rgb ^= 0x808080
            img.setRGB(x, y, rgb | 0xFF000000)
            x += 1
          }
          y += 1
        }
        Asset(id, ImageCodec.encode(img, "png"))
      }
    }.toDF()
  }

  /** Perceptual average-hash of the top-left 8×8 crop of each DECODED
    * image, as four 16-bit bands (wide row, never a 64-bit value — no
    * sign games anywhere): integer luma (r·299+g·587+b·114)/1000 per
    * pixel, integer mean, bit (y·8+x) set iff gray > mean, band j =
    * bits [16j, 16j+16). Lossless formats only make sense here (JPEG
    * decode perturbs pixels); images narrower than 8×8 are skipped.
    * Partition-batched real decode — the codec never touches the
    * driver. */
  def aHashBands(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          ImageCodec.decode(bytes)
            .filter(img => img.getWidth >= 8 && img.getHeight >= 8)
            .map { img =>
              val gray = new Array[Int](64)
              var s = 0L
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  val rgb = img.getRGB(x, y)
                  val g = (((rgb >> 16) & 255) * 299 +
                    ((rgb >> 8) & 255) * 587 + (rgb & 255) * 114) / 1000
                  gray(y * 8 + x) = g; s += g
                  x += 1
                }
                y += 1
              }
              val mean = s / 64
              val bands = new Array[Int](4)
              var p = 0
              while (p < 64) {
                if (gray(p) > mean) bands(p / 16) |= 1 << (p % 16)
                p += 1
              }
              (id, bands(0), bands(1), bands(2), bands(3))
            }
        }
      }.toDF("doc_id", "b0", "b1", "b2", "b3")
  }

  /** Near-duplicate image CLASSES by banded hamming join, with the
    * exact-collapse discipline every banding path in the repo applies
    * (the q28 MinHash convention): identical hashes collapse to ONE
    * class row (rep = min id, n = members) BEFORE any pairing, so a
    * template-heavy corpus — where thousands of images share a hash —
    * yields one class row instead of n² pairs. Output:
    *   (id_a = id_b = rep, hamming 0, n ≥ 2)   — an identical-hash class
    *   (rep_a, rep_b, hamming 1..max, n_a, n_b) — distinct-class near-dups
    * Candidates share ≥ 1 of the 4 bands — for maxHamming ≤ 3 the
    * pigeonhole makes the banded join EXACT (≤ 3 flipped bits touch ≤ 3
    * bands, one survives verbatim), the SimHash recall argument applied
    * to pixels; classes, not rows, enter the join, so candidate volume
    * is Σ distinct-bucket² — never an all-pairs and never hot-bucket
    * quadratic in duplicate count. */
  def imageNearDupPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 3,
      "4-band pigeonhole guarantees recall only for maxHamming <= 3")
    val classes = hashes.groupBy("b0", "b1", "b2", "b3")
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n"))
      .localCheckpoint(true) // consumed three times below
    val zero = classes.filter(col("n") >= 2)
      .select(col("rep").as("id_a"), col("rep").as("id_b"),
        lit(0).as("hamming"), col("n").as("n_a"), col("n").as("n_b"))
    val bands = classes.select(col("rep"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))).as(Seq("j", "v")))
    val cand = bands.select(col("j"), col("v"), col("rep").as("id_a"))
      .join(bands.select(col("j"), col("v"), col("rep").as("id_b")), Seq("j", "v"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val ca = classes.select(col("rep").as("id_a"), col("n").as("n_a"),
      col("b0").as("a0"), col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val cb = classes.select(col("rep").as("id_b"), col("n").as("n_b"),
      col("b0").as("c0"), col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    val near = cand.join(ca, "id_a").join(cb, "id_b")
      .withColumn("hamming", (
        bit_count(col("a0").bitwiseXOR(col("c0"))) +
        bit_count(col("a1").bitwiseXOR(col("c1"))) +
        bit_count(col("a2").bitwiseXOR(col("c2"))) +
        bit_count(col("a3").bitwiseXOR(col("c3")))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"), col("n_a"), col("n_b"))
    zero.select(col("id_a"), col("id_b"), col("hamming").cast("int"),
      col("n_a"), col("n_b")).unionByName(near)
  }

  /** Rate/channels/frames/amplitude of a [[synthAudio]] asset as pure
    * functions of doc_id — the q66 trick applied to audio: DuckDB
    * predicts them arithmetically, Spark recovers them by actually
    * parsing the RIFF container with the JRE codec. The waveform is a
    * square wave at amplitude `synthAmp`, so Σ|sample| =
    * amp · frames · channels exactly — an integer the oracle reproduces,
    * and one that breaks on any endianness / interleave / header bug. */
  def synthRate(id: Long): Int =
    (id % 4) match { case 0 => 8000; case 1 => 16000; case 2 => 22050; case _ => 44100 }
  def synthChannels(id: Long): Int = 1 + (id % 2).toInt
  def synthAudioFrames(id: Long): Int = 50 + (id % 100).toInt
  def synthAmp(id: Long): Int = 1000 + (id % 7).toInt * 1000

  /** Per-clip augmentation statistics row — see [[augmentAudio]]. */
  final case class AudioAugStat(doc_id: Long, sample_rate: Int, channels: Int,
    gain: Int, off: Int, n_frames: Int, sum_abs: Long, wsigned: Long)

  /** Deterministic per-epoch audio augmentation (q186) — [[augmentImages]]
    * for the WAV path: integer gain ∈ {1,2,3} and a leading frame-crop
    * offset ∈ {0,1,2} (clip shortened by 4 frames total), both pure md5
    * functions of (epoch, id). The augmented PCM is RE-ENCODED through
    * the RIFF writer and RE-DECODED by the JRE parser before its
    * statistics are read — codec roundtrip on the transform path.
    * Gain saturates at ±32767 (exact integer clip, stated). Surface:
    * Σ|s| and the SIGNED position-weighted Σ(131·frame + chan)·s —
    * the square wave's constant |s| makes any unsigned statistic
    * offset-blind, while the sign pattern (o+j alternation) moves
    * wsigned on every offset/interleave/endianness bug. */
  def augmentAudio(spark: SparkSession, assets: DataFrame,
      epoch: String): Dataset[AudioAugStat] = {
    import spark.implicits._
    assets.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val pcm = AudioCodec.decodeWav(bytes).getOrElse(
            throw new IllegalArgumentException(s"undecodable audio for doc $id"))
          val ch = pcm.channels
          val frames = (pcm.samples.length / ch)
          require(frames > 4, s"clip $id too short to crop ($frames frames)")
          val gain = md5Mod(s"auga:$epoch", id, 3) + 1
          val off = md5Mod(s"augo:$epoch", id, 3)
          val cf = frames - 4
          val outS = new Array[Short](cf * ch)
          var j = 0
          while (j < cf) {
            var c = 0
            while (c < ch) {
              val v = pcm.samples((off + j) * ch + c).toInt * gain
              outS(j * ch + c) =
                math.max(-32767, math.min(32767, v)).toShort
              c += 1
            }
            j += 1
          }
          val dec = AudioCodec.decodeWav(
            AudioCodec.encodeWav(outS, pcm.sampleRate, ch)).get
          var sumAbs = 0L; var wsigned = 0L
          var i = 0
          while (i < dec.samples.length) {
            val s = dec.samples(i).toLong
            sumAbs += math.abs(s)
            wsigned += (131L * (i / ch) + (i % ch)) * s
            i += 1
          }
          AudioAugStat(id, dec.sampleRate, dec.channels, gain, off,
            (dec.samples.length / dec.channels), sumAbs, wsigned)
        }
      }
  }

  /** Generate REAL audio (decodable PCM16 WAV bytes) per document id. */
  def synthAudio(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    balanced(docs.select(col("doc_id"))).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val (rate, ch, frames, amp) =
            (synthRate(id), synthChannels(id), synthAudioFrames(id), synthAmp(id))
          val samples = new Array[Short](frames * ch)
          var i = 0
          while (i < samples.length) {
            // square wave per frame: |sample| = amp at every position
            samples(i) = (if ((i / ch) % 2 == 0) amp else -amp).toShort
            i += 1
          }
          Asset(id, AudioCodec.encodeWav(samples, rate, ch))
        }
      }.toDF()
  }

  /** Decoded audio metadata — every field recovered from the REAL parse. */
  final case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
      n_frames: Int, sum_abs: Long)

  /** Audio decode/feature stage: partition-batched JRE parse; undecodable
    * payloads carry -1s (the opaque path, same contract as images). */
  def extractAudioFeatures(spark: SparkSession, assets: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    assets.select(col("doc_id"), col("payload")).as[Asset]
      .mapPartitions { batch =>
        batch.map { a =>
          AudioCodec.decodeWav(a.payload) match {
            case Some(pcm) =>
              var s = 0L
              pcm.samples.foreach(v => s += math.abs(v.toLong))
              AudioMeta(a.doc_id, pcm.sampleRate, pcm.channels,
                pcm.nFrames.toInt, s)
            case None => AudioMeta(a.doc_id, -1, -1, -1, -1L)
          }
        }
      }
  }

  /** A transformed audio payload: real resampled WAV for decodable
    * inputs, pass-through geometry for opaque ones. */
  final case class ResampledAudio(doc_id: Long, sample_rate: Int, channels: Int,
      n_frames: Int, payload: Array[Byte])

  /** Audio transform stage — the audio counterpart of [[resizeImages]]:
    * decodable WAVs are REALLY transformed (JRE decode → mono downmix by
    * integer-average of each frame's channels → ÷`decimate` frame
    * decimation → re-encode at rate/decimate), so the output payload is
    * itself a decodable WAV at the new geometry (roundtrip tested);
    * opaque payloads pass through with -1 geometry, same contract as the
    * image stage. Per-row CPU kernel, no shuffle. */
  def resampleAudio(spark: SparkSession, assets: DataFrame,
      decimate: Int = 2): Dataset[ResampledAudio] = {
    import spark.implicits._
    require(decimate >= 1, s"decimate must be >= 1: $decimate")
    assets.select(col("doc_id"), col("payload")).as[Asset]
      .mapPartitions { batch =>
        batch.map { a =>
          AudioCodec.decodeWav(a.payload) match {
            case Some(pcm) =>
              val inFrames = pcm.nFrames.toInt
              val outFrames = (inFrames + decimate - 1) / decimate
              val out = new Array[Short](outFrames)
              var f = 0
              while (f < outFrames) {
                // mono downmix: integer mean of the source frame's channels
                var sum = 0L
                var c = 0
                while (c < pcm.channels) {
                  sum += pcm.samples(f * decimate * pcm.channels + c); c += 1
                }
                out(f) = (sum / pcm.channels).toShort
                f += 1
              }
              val rate = math.max(1, pcm.sampleRate / decimate)
              ResampledAudio(a.doc_id, rate, 1, outFrames,
                AudioCodec.encodeWav(out, rate, 1))
            case None => ResampledAudio(a.doc_id, -1, -1, -1, a.payload)
          }
        }
      }
  }

  // ---- perceptual audio fingerprint (energy-delta bits) ----

  /** Noise-textured PCM16 sample as a pure integer function of
    * (waveform key, frame index) — the q111 pixel formula applied to
    * audio, so an oracle derives every sample arithmetically while
    * Spark round-trips REAL WAV bytes. The middle-square step (v² ≫ 8)
    * is the load-bearing nonlinearity: a plain LCG of (base, t) makes
    * every waveform a PHASE SHIFT of one arithmetic progression, and
    * phase-shifted energy profiles near-collide — fingerprints then
    * pair quadratically (measured: 40% of ALL pairs under hamming ≤ 3).
    * Squaring scrambles the middle bits per (base, t), and the answer
    * is sparse again. */
  def synthNoiseSample(base: Long, t: Int): Short = {
    val v = (base * 1103515245L + t.toLong * 12345L) & 0xFFFFL
    ((((v * v) >> 8) & 0xFFFFL) - 32768L).toShort
  }

  /** Frames per [[synthNoiseAudio]] asset: 65 windows × 8 frames — 64
    * energy-delta bits. */
  val NoiseFrames: Int = 520

  /** Generate REAL mono 8 kHz WAVs whose samples follow
    * [[synthNoiseSample]] (decodable by any RIFF parser). */
  def synthNoiseAudio(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    balanced(docs.select(col("doc_id"))).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val samples = Array.tabulate(NoiseFrames)(t => synthNoiseSample(id, t))
          Asset(id, AudioCodec.encodeWav(samples, 8000, 1))
        }
      }.toDF()
  }

  /** Planted near-twin WAV pairs: ids base+2i carry waveform base+2i;
    * ids base+2i+1 carry the SAME waveform with frame 0 zeroed — one
    * window's energy moves, so at most ONE fingerprint bit flips
    * (hamming ≤ 1: a near-dup row, or an identical-hash class when the
    * bit doesn't cross its threshold). */
  def synthTwinAudio(spark: SparkSession, nPairs: Int, base: Long): DataFrame = {
    import spark.implicits._
    spark.range(nPairs).as[Long]
      .flatMap { i =>
        val wf = base + 2 * i
        val orig = Array.tabulate(NoiseFrames)(t => synthNoiseSample(wf, t))
        val twin = orig.clone(); twin(0) = 0
        Seq(Asset(wf, AudioCodec.encodeWav(orig, 8000, 1)),
          Asset(wf + 1, AudioCodec.encodeWav(twin, 8000, 1)))
      }.toDF()
  }

  /** Haitsma–Kalker-style fingerprint (ISMIR'02, the energy-delta
    * primitive of industrial audio fingerprinting) over REAL decoded
    * PCM: window w's energy E_w = Σ s² over 8 frames (exact long —
    * 8·32768² < 2^34), bit p = [E_{p+1} > E_p] for p ∈ [0, 64), packed
    * into 4 bands of 16 bits — the SAME (doc_id, b0..b3) shape as
    * [[aHashBands]], so [[imageNearDupPairs]]' class-collapsed banded
    * hamming join runs unchanged on audio. Mono payloads shorter than
    * [[NoiseFrames]] frames are skipped (documented domain). Per-row
    * decode kernel, no shuffle. */
  def audioFingerprintBands(spark: SparkSession, assets: DataFrame): DataFrame = {
    import spark.implicits._
    assets.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          AudioCodec.decodeWav(bytes)
            .filter(p => p.channels == 1 && p.samples.length >= NoiseFrames)
            .map { pcm =>
              val e = new Array[Long](65)
              var t = 0
              while (t < NoiseFrames) {
                val s = pcm.samples(t).toLong
                e(t / 8) += s * s
                t += 1
              }
              val bands = new Array[Int](4)
              var p = 0
              while (p < 64) {
                if (e(p + 1) > e(p)) bands(p / 16) |= 1 << (p % 16)
                p += 1
              }
              (id, bands(0), bands(1), bands(2), bands(3))
            }
        }
      }.toDF("doc_id", "b0", "b1", "b2", "b3")
  }

  // ---- temporal video fingerprint (luma-delta bits over frames) ----

  /** Frames per [[synthVideo]] asset: 65 frames × [[VideoFrameBytes]]
    * bytes — 64 luma-delta bits, the q156 window count applied to the
    * time axis. */
  val VideoFrames: Int = 65
  val VideoFrameBytes: Int = 64

  /** Pseudo-video payload byte at global byte index i — the q156
    * middle-square formula (the nonlinearity matters for the same
    * reason: phase-shifted linear payloads would near-collide). */
  def synthVideoByte(base: Long, i: Int): Byte = {
    val v = (base * 1103515245L + i.toLong * 12345L) & 0xFFFFL
    (((v * v) >> 8) & 0xFFL).toByte
  }

  /** Generate pseudo-video payloads: 4-byte magic "VID0" + 65 fixed-size
    * frames whose bytes follow [[synthVideoByte]]. No video codec ships
    * with the JRE (the [[sampleFrames]] contract), so the container IS
    * the honest format here — the fingerprint story is the temporal
    * structure, not the codec. */
  def synthVideo(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val magic = "VID0".getBytes("US-ASCII")
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val body = Array.tabulate(VideoFrames * VideoFrameBytes)(
            i => synthVideoByte(id, i))
          Asset(id, magic ++ body)
        }
      }.toDF()
  }

  /** Planted near-twin videos: ids base+2i carry payload base+2i; ids
    * base+2i+1 carry the SAME payload with frame 0 zeroed — one frame's
    * luma moves, at most ONE temporal bit flips. */
  def synthTwinVideo(spark: SparkSession, nPairs: Int, base: Long): DataFrame = {
    import spark.implicits._
    val magic = "VID0".getBytes("US-ASCII")
    spark.range(nPairs).as[Long]
      .flatMap { i =>
        val wf = base + 2 * i
        val orig = Array.tabulate(VideoFrames * VideoFrameBytes)(
          b => synthVideoByte(wf, b))
        val twin = orig.clone()
        java.util.Arrays.fill(twin, 0, VideoFrameBytes, 0.toByte)
        Seq(Asset(wf, magic ++ orig), Asset(wf + 1, magic ++ twin))
      }.toDF()
  }

  /** Per-frame luma proxy (unsigned byte sum) over [[sampleFrames]]
    * output — the only kernel step (binary column bytes are opaque to
    * Catalyst); everything after is declarative. */
  def frameLuma(spark: SparkSession, frames: Dataset[Frame]): DataFrame = {
    import spark.implicits._
    frames.mapPartitions { it =>
      it.map { f =>
        var s = 0L
        var i = 0
        while (i < f.frame.length) { s += f.frame(i) & 0xFF; i += 1 }
        (f.doc_id, f.frame_idx, s)
      }
    }.toDF("doc_id", "frame_idx", "luma")
  }

  /** Temporal video fingerprint — the q156 energy-delta construction on
    * the TIME axis (TIRI-style temporal signatures): bit f =
    * [L_{f+1} > L_f] over 64 consecutive frame-luma deltas, packed into
    * q111's (doc_id, b0..b3) band shape so [[imageNearDupPairs]] serves
    * video too — one class-collapsed banded-hamming join kernel for all
    * three modalities. COMPOSED from [[sampleFrames]] (the existing
    * demux stage) + [[frameLuma]] + a declarative lead/sum packing: one
    * doc-keyed window, one groupBy — no bespoke fingerprint kernel.
    * Assets shorter than [[VideoFrames]] frames are skipped. */
  def videoFingerprintBands(spark: SparkSession, assets: DataFrame): DataFrame = {
    val lum = frameLuma(spark,
      sampleFrames(spark, assets, frameBytes = VideoFrameBytes, everyN = 1))
      .filter(col("frame_idx") < VideoFrames)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    lum
      .withColumn("nf", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .filter(col("nf") >= VideoFrames)
      .withColumn("nxt", lead(col("luma"), 1).over(w))
      .filter(col("frame_idx") < VideoFrames - 1)
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("nxt") > col("luma") && col("frame_idx") < 16,
          pow(lit(2.0), pmod(col("frame_idx"), lit(16))).cast("int")).otherwise(0))
          .cast("int").as("b0"),
        sum(when(col("nxt") > col("luma") &&
          col("frame_idx") >= 16 && col("frame_idx") < 32,
          pow(lit(2.0), pmod(col("frame_idx"), lit(16))).cast("int")).otherwise(0))
          .cast("int").as("b1"),
        sum(when(col("nxt") > col("luma") &&
          col("frame_idx") >= 32 && col("frame_idx") < 48,
          pow(lit(2.0), pmod(col("frame_idx"), lit(16))).cast("int")).otherwise(0))
          .cast("int").as("b2"),
        sum(when(col("nxt") > col("luma") && col("frame_idx") >= 48,
          pow(lit(2.0), pmod(col("frame_idx"), lit(16))).cast("int")).otherwise(0))
          .cast("int").as("b3"))
  }

  /** Magic-byte format sniff — pure expression, codegen'd. */
  def sniffFormat(df: DataFrame): DataFrame =
    df.withColumn("format",
      when(hex(substring(col("payload"), 1, 4)) === "89504E47", "png")
        .when(hex(substring(col("payload"), 1, 3)) === "FFD8FF", "jpeg")
        .when(hex(substring(col("payload"), 1, 2)) === "424D", "bmp")
        .when(hex(substring(col("payload"), 1, 3)) === "494433", "mp3")
        .otherwise("unknown"))

  /** The decode/feature-extract stage: partition-batched, typed. Image
    * payloads get a REAL decode ([[ImageCodec.decode]]) — width, height and
    * channel count are read from the decoded raster, not the container.
    * Non-image payloads (audio, or image-magic bytes that do not decode)
    * carry -1 geometry plus two deterministic byte-hash features. */
  def extractFeatures(spark: SparkSession, assets: DataFrame): Dataset[AssetMeta] = {
    import spark.implicits._
    assets.select(col("doc_id"), col("payload")).as[Asset]
      .mapPartitions { batch =>
        batch.map { a =>
          val p = a.payload
          val fmt =
            if (p.length >= 4 && (p(0) & 0xFF) == 0x89 && p(1) == 'P') "png"
            else if (p.length >= 3 && (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) == 0xD8) "jpeg"
            else if (p.length >= 2 && p(0) == 'B' && p(1) == 'M') "bmp"
            else if (p.length >= 3 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') "mp3"
            else "unknown"
          val img = if (fmt == "png" || fmt == "jpeg" || fmt == "bmp")
            ImageCodec.decode(p) else None
          val (w, h, c) = img match {
            case Some(i) => (i.getWidth, i.getHeight, ImageCodec.channels(i))
            case None    => (-1, -1, -1)
          }
          val f0 = p.foldLeft(1125899906842597L)((hh, b) => 31 * hh + (b & 0xFF))
          val f1 = p.length.toLong * 2654435761L
          AssetMeta(a.doc_id, p.length, fmt, w, h, c, f0, f1)
        }
      }
  }

  /** Resize stage: one-to-one partition-batched transform. Decodable images
    * are REALLY resampled (decode → bilinear scale to (w, h) → PNG
    * re-encode); opaque payloads fall back to a deterministic byte-budget
    * subsample (w*h/64 bytes past the magic, magic preserved so the result
    * still sniffs). */
  def resizeImages(spark: SparkSession, assets: DataFrame,
      w: Int, h: Int): Dataset[ResizedAsset] = {
    import spark.implicits._
    val budget = math.max(1, w * h / 64)
    assets.select(col("doc_id"), col("payload")).as[Asset]
      .mapPartitions { batch =>
        batch.map { a =>
          ImageCodec.decode(a.payload) match {
            case Some(img) =>
              val scaled = ImageCodec.resample(img, w, h)
              ResizedAsset(a.doc_id, w, h, ImageCodec.encode(scaled, "png"))
            case None =>
              val (magic, body) = a.payload.splitAt(math.min(4, a.payload.length))
              val out =
                if (body.length <= budget) body
                else Array.tabulate(budget)(i => body(i * body.length / budget))
              ResizedAsset(a.doc_id, w, h, magic ++ out)
          }
        }
      }
  }

  /** Frame-sampling stage: the one-to-MANY batched transform (the
    * flatMap-shaped plumbing a real video demuxer needs — each input row
    * fans out to a bounded row set). No video codec ships with the JRE, so
    * the payload past the magic is treated as fixed-size pseudo-frames and
    * every `everyN`-th is emitted. */
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
