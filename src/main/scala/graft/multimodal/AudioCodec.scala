package graft.multimodal

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

/** Zero-dependency WAV/PCM audio codec over JDK `javax.sound.sampled`
  * (RIFF/WAVE parsing ships with the JRE, no audio device needed) — the
  * audio counterpart of [[ImageCodec]]: the encoder writes the RIFF
  * container by hand (like the xlsx zip and the ISO 32000 PDF writer),
  * the DECODER is the genuine JRE codec, so a recovered sample rate /
  * channel count / frame count / PCM payload proves a real parse, not an
  * echo of our own arithmetic.
  *
  * Same scale shape as the image kernel: CPU-bound per-row work, no
  * shuffle, embarrassingly parallel across partitions. Compressed audio
  * (MP3/AAC) has no JRE codec and stays on the opaque-payload path —
  * honestly labeled, exactly like video.
  */
object AudioCodec {

  /** Hand-written RIFF/WAVE container around 16-bit little-endian PCM.
    * `samples` are interleaved frames (frame = one short per channel). */
  def encodeWav(samples: Array[Short], sampleRate: Int, channels: Int): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0,
      s"samples (${samples.length}) must be a whole number of $channels-channel frames")
    val dataLen = samples.length * 2
    val byteRate = sampleRate * channels * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate).putInt(byteRate)
      .putShort((channels * 2).toShort) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  /** Decoded PCM stream: rate and channel count from the parsed header,
    * interleaved 16-bit samples from the payload. */
  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def nFrames: Long = samples.length.toLong / channels
  }

  /** REAL decode via the JRE's audio system. None when the bytes are not
    * a parseable PCM16 WAV (compressed audio, other modalities, junk). */
  def decodeWav(bytes: Array[Byte]): Option[Pcm] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        if (f.getSampleSizeInBits != 16) return None
        val raw = in.readAllBytes()
        val bb = java.nio.ByteBuffer.wrap(raw).order(
          if (f.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val samples = new Array[Short](raw.length / 2)
        var i = 0
        while (i < samples.length) { samples(i) = bb.getShort(); i += 1 }
        Some(Pcm(f.getSampleRate.toInt, f.getChannels, samples))
      } finally in.close()
    } catch { case _: Exception => None }
}
