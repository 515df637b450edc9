package graft

import graft.multimodal.{AudioCodec, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** The D12 audio path is REAL (javax.sound.sampled): these pin the
  * lossless WAV/PCM roundtrip, the nearest-neighbor resample index
  * map, and the gate table's end-to-end determinism under
  * repartitioning — the audio mirror of ImageCodecSpec.
  */
class AudioCodecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("WAV encode→decode roundtrip is lossless for every sample") {
    for (seed <- Seq(0L, 7L, 123L); n <- Seq(1, 50, 249)) {
      val dec = AudioCodec.decode(AudioCodec.syntheticWav(seed, 16000, n))
      assert(dec.sampleRate === 16000)
      assert(dec.channels === 1)
      assert(dec.samples.length === n)
      for (i <- 0 until n)
        assert(dec.samples(i) === AudioCodec.sampleValue(seed, i), s"seed=$seed i=$i")
    }
  }

  test("sample formula spans int16 and matches the oracle arithmetic") {
    // formula: ((seed + 37 i) mod 65536) - 32768
    assert(AudioCodec.sampleValue(0L, 0) === -32768)
    assert(AudioCodec.sampleValue(65535L, 0) === 32767)
    assert(AudioCodec.sampleValue(5L, 3) === ((5 + 37 * 3) % 65536) - 32768)
  }

  test("stereo payloads mix down to mono AND report channels=1") {
    // hand-build a 2-channel WAV; decoded samples are the per-frame
    // integer mean, and Decoded.channels must describe the DECODED
    // (mono) samples — so a re-encode + re-decode is a fixed point
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val frames = Seq((100, 200), (-50, 70), (32767, -32768))
    val pcm = new Array[Byte](frames.length * 4)
    frames.zipWithIndex.foreach { case ((l, r), f) =>
      for ((v, c) <- Seq(l -> 0, r -> 1)) {
        pcm(f * 4 + 2 * c) = (v & 0xff).toByte
        pcm(f * 4 + 2 * c + 1) = ((v >> 8) & 0xff).toByte
      }
    }
    val fmt = new AudioFormat(16000f, 16, 2, true, false)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
      frames.length.toLong), AudioFileFormat.Type.WAVE, bos)
    val dec = AudioCodec.decode(bos.toByteArray)
    assert(dec.channels === 1, "metadata must match the mixed-down samples")
    assert(dec.samples.toSeq === frames.map { case (l, r) => (l + r) / 2 })
    val again = AudioCodec.decode(AudioCodec.encodeWav(dec))
    assert(again.channels === 1)
    assert(again.samples.toSeq === dec.samples.toSeq)
  }

  test("garbage bytes are not decodable audio") {
    assert(AudioCodec.tryDecode("not a wav at all".getBytes).isEmpty)
    assert(AudioCodec.tryDecode(Array.emptyByteArray).isEmpty)
    // recognized RIFF signature but truncated body must also map to
    // None — one bad blob must not kill a whole partition
    val truncated = AudioCodec.syntheticWav(5L, 16000, 100).take(30)
    assert(AudioCodec.tryDecode(truncated).isEmpty)
  }

  test("nearest-neighbor resample uses src = dst*srcN/dstN integer map") {
    val src = AudioCodec.decode(AudioCodec.syntheticWav(42L, 16000, 130))
    val rs = AudioCodec.resampleNearest(src, 40)
    assert(rs.samples.length === 40)
    for (i <- 0 until 40)
      assert(rs.samples(i) === src.samples(i * 130 / 40), s"i=$i")
  }

  test("re-encoded resample survives a second decode bit-exactly") {
    val src = AudioCodec.decode(AudioCodec.syntheticWav(9L, 16000, 77))
    val rs = AudioCodec.resampleNearest(src, 40)
    val again = AudioCodec.decode(AudioCodec.encodeWav(rs))
    assert(again.samples.toSeq === rs.samples.toSeq)
    assert(again.sampleRate === 16000)
  }

  test("audioDecodeTable is deterministic and partition-invariant") {
    val docs = Tables(spark, sf, "documents")
    val a = Multimodal.audioDecodeTable(docs).collect()
      .map(r => r.doc_id -> ((r.n_samples, r.sample_sum, r.resampled_sum))).toMap
    val b = Multimodal.audioDecodeTable(docs.repartition(7)).collect()
      .map(r => r.doc_id -> ((r.n_samples, r.sample_sum, r.resampled_sum))).toMap
    assert(a === b)
    assert(a.nonEmpty)
    // spot-check one row against the closed form
    val (id, (n, ssum, rsum)) = a.head
    assert(n === (id % 200 + 50).toInt)
    assert(ssum === (0 until n).map(i => AudioCodec.sampleValue(id, i).toLong).sum)
    assert(rsum === (0 until 40).map(i =>
      AudioCodec.sampleValue(id, i * n / 40).toLong).sum)
  }

  test("resampleAudio really re-encodes decodable payloads") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "audio", AudioCodec.syntheticWav(1L, 16000, 130),
        Multimodal.MediaMeta(0, 0, 1, 16000, 130)),
      Multimodal.MediaRow(4L, "audio", "not audio".getBytes,
        Multimodal.MediaMeta(0, 0, 1, 16000, 1)),
      Multimodal.MediaRow(0L, "image", "png stand-in".getBytes,
        Multimodal.MediaMeta(10, 10, 1, 0, 1))).toDF()
    val out = Multimodal.resampleAudio(media, 40).collect().map(r => r.doc_id -> r).toMap
    val real = AudioCodec.decode(out(1L).data)
    assert(real.samples.length === 40)
    val expect = AudioCodec.resampleNearest(
      AudioCodec.decode(AudioCodec.syntheticWav(1L, 16000, 130)), 40)
    assert(real.samples.toSeq === expect.samples.toSeq)
    assert(out(1L).meta.nFrames === 40)
    // non-decodable audio still gets the stub contract
    assert(out(4L).meta.nFrames === 40)
    // non-audio passes through untouched
    assert(new String(out(0L).data) === "png stand-in")
  }
}
