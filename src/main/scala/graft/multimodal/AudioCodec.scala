package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL audio codec over the JDK's `javax.sound.sampled` — the second
  * genuinely-decodable modality after [[ImageCodec]] (SURVEY.md
  * §2.D12): payloads are genuine RIFF/WAV bytes (16-bit signed PCM,
  * little-endian), decode reads them back through `AudioSystem`, and
  * resampling is nearest-neighbor over the DECODED samples (index map
  * `src = dst * srcN / dstN`, integer division — the same arithmetic
  * an oracle can state in SQL, and the 1-D analogue of
  * [[ImageCodec.resizeNearest]]).
  *
  * Everything stays deterministic: PCM in a WAV container is lossless,
  * mono 16-bit has one two-byte little-endian sample per frame, and
  * nearest-neighbor has no filter kernel — so a decoded sample
  * checksum is exactly reproducible by an engine that never saw the
  * bytes. Only video now remains stubbed (no in-JDK codec).
  */
object AudioCodec {

  /** Decoded PCM audio: one signed 16-bit sample per frame (mono). */
  final case class Decoded(sampleRate: Int, channels: Int, samples: Array[Int])

  /** The deterministic sample formula, shared by generator and oracle:
    * sample(seed, i) = ((seed + 37·i) mod 65536) − 32768 — spans the
    * full int16 range and is pure integer arithmetic.
    */
  def sampleValue(seed: Long, i: Int): Int =
    (((seed + 37L * i) % 65536L) - 32768L).toInt

  /** Deterministic mono test clip, REALLY encoded to WAV via
    * `AudioSystem.write` (RIFF header + PCM payload).
    */
  def syntheticWav(seed: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    require(sampleRate > 0 && nSamples > 0, s"invalid clip ${sampleRate}Hz x$nSamples")
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val v = sampleValue(seed, i)
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val in = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV payload back to signed samples; None if the bytes
    * are not decodable audio. `AudioSystem` signals that with
    * `UnsupportedAudioFileException` (unknown signature) or reader
    * exceptions on recognized-but-corrupt payloads — both must map to
    * None, or one bad blob in a batch kills the whole Spark task.
    * Multi-channel input collapses to integer-mean per frame (the
    * luminance move of [[ImageCodec.tryDecode]], still exact math).
    */
  def tryDecode(data: Array[Byte]): Option[Decoded] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(data))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getEncoding.toString != "PCM_SIGNED")
          None
        else {
          val channels = fmt.getChannels
          val bytes = in.readAllBytes()
          val bytesPerFrame = 2 * channels
          val n = bytes.length / bytesPerFrame
          val out = new Array[Int](n)
          val big = fmt.isBigEndian
          var f = 0
          while (f < n) {
            var s = 0
            var c = 0
            while (c < channels) {
              val o = f * bytesPerFrame + 2 * c
              val v =
                if (big) (bytes(o) << 8) | (bytes(o + 1) & 0xff)
                else (bytes(o + 1) << 8) | (bytes(o) & 0xff)
              s += v.toShort.toInt
              c += 1
            }
            out(f) = s / channels
            f += 1
          }
          // channels describes the DECODED samples, which are mono
          // after mixdown — keeping the container's count would make a
          // re-encode of these samples claim channels the bytes lack
          Some(Decoded(fmt.getSampleRate.toInt, 1, out))
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Strict decode for payloads this library produced. */
  def decode(data: Array[Byte]): Decoded =
    tryDecode(data).getOrElse(
      throw new IllegalArgumentException(s"not a decodable WAV payload (${data.length} bytes)"))

  /** Nearest-neighbor resample to exactly `n` samples:
    * `src = dst * srcN / dstN` with integer division — no filter, no
    * floats, SQL-stateable.
    */
  def resampleNearest(d: Decoded, n: Int): Decoded = {
    require(n > 0, s"invalid target length $n")
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = d.samples((i.toLong * d.samples.length / n).toInt)
      i += 1
    }
    d.copy(samples = out)
  }

  /** Exact checksum of decoded samples (oracle surface). */
  def sampleSum(d: Decoded): Long = {
    var s = 0L
    var i = 0
    while (i < d.samples.length) { s += d.samples(i); i += 1 }
    s
  }

  /** Re-encode decoded mono samples to WAV (resample apply-step). */
  def encodeWav(d: Decoded): Array[Byte] = {
    val pcm = new Array[Byte](d.samples.length * 2)
    var i = 0
    while (i < d.samples.length) {
      pcm(2 * i) = (d.samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((d.samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(d.sampleRate.toFloat, 16, 1, true, false)
    val in = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, d.samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }
}
