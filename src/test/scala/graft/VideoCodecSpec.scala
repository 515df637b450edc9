package graft

import graft.multimodal.{ImageCodec, Multimodal, VideoCodec}
import org.scalatest.funsuite.AnyFunSuite

/** The D12 video path is REAL (GVID container of genuine PNG frames,
  * demuxed and per-frame ImageIO-decoded): these pin the mux/demux
  * roundtrip, the uniform sample index map, corrupt-container
  * robustness, and the gate table's determinism — the video mirror of
  * ImageCodecSpec/AudioCodecSpec, closing the last stub.
  */
class VideoCodecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("mux→demux roundtrip preserves every frame byte-exactly") {
    val clip = VideoCodec.syntheticVideo(seed = 9L, w = 10, h = 7, nFrames = 5, fps = 12)
    val d = VideoCodec.demux(clip)
    assert(d.fps === 12)
    assert(d.frames.length === 5)
    for (f <- 0 until 5) {
      assert(d.frames(f).toSeq === ImageCodec.syntheticPng(9L + 101L * f, 10, 7).toSeq,
        s"frame $f")
      val dec = ImageCodec.decode(d.frames(f))
      assert(dec.width === 10 && dec.height === 7)
      // frame-f formula: (seed + 101f + 7x + 13y) mod 256
      assert(dec.pixels(0) === ((9L + 101L * f) % 256).toInt, s"frame $f origin pixel")
    }
  }

  test("uniform sample uses the src = i*n/k integer index map") {
    assert(VideoCodec.sampleIndices(30, 4) === Seq(0, 7, 15, 22))
    assert(VideoCodec.sampleIndices(3, 4) === Seq(0, 1, 2), "k caps at n")
    assert(VideoCodec.sampleIndices(1, 4) === Seq(0))
    val clip = VideoCodec.syntheticVideo(1L, 8, 8, 30)
    val sample = VideoCodec.frameSample(clip, 4)
    assert(sample.map(_._1) === Seq(0, 7, 15, 22))
    // each sampled frame decodes to ITS source frame's formula
    for ((src, dec) <- sample)
      assert(dec.pixels(0) === ((1L + 101L * src) % 256).toInt, s"src=$src")
  }

  test("garbage, truncated, and length-bombed containers are not decodable") {
    assert(VideoCodec.tryDemux("definitely not a video".getBytes).isEmpty)
    assert(VideoCodec.tryDemux(Array.emptyByteArray).isEmpty)
    val clip = VideoCodec.syntheticVideo(3L, 8, 8, 4)
    assert(VideoCodec.tryDemux(clip.take(clip.length / 2)).isEmpty, "truncated body")
    assert(VideoCodec.tryDemux(clip.take(7)).isEmpty, "truncated header")
    // corrupt a frame-length prefix to an insane value: must refuse to
    // allocate, not OOM the executor (header = 4 magic + 1 ver + 8)
    val bombed = clip.clone()
    bombed(13) = 0x7f.toByte
    assert(VideoCodec.tryDemux(bombed).isEmpty)
  }

  test("videoFrameTable is deterministic, partition-invariant, and formula-exact") {
    val docs = Tables(spark, sf, "documents")
    val a = Multimodal.videoFrameTable(docs).collect().sortBy(r => (r.doc_id, r.frame_idx))
    val b = Multimodal.videoFrameTable(docs.repartition(7)).collect()
      .sortBy(r => (r.doc_id, r.frame_idx))
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
    // spot-check one row against the pure formula
    val r = a.head
    val (w, h) = ((r.doc_id % 16 + 8).toInt, (r.doc_id % 12 + 8).toInt)
    assert(r.width === w && r.height === h)
    val expect = (for (y <- 0 until h; x <- 0 until w)
      yield (r.doc_id + 101L * r.src_frame + 7L * x + 13L * y) % 256).sum
    assert(r.pixel_sum === expect)
    // ≤4 frames per video, exactly min(4, nf)
    val counts = a.groupBy(_.doc_id).map { case (id, rows) => id -> rows.length }
    counts.foreach { case (id, n) =>
      assert(n === math.min(4, (id % 30 + 1).toInt), s"doc $id")
    }
  }

  test("sampleFrames emits REAL png frame bytes for real containers") {
    import spark.implicits._
    val clip = VideoCodec.syntheticVideo(6L, 8, 8, 10)
    val media = Seq(Multimodal.MediaRow(6L, "video", clip,
      Multimodal.MediaMeta(8, 8, 1, 0, 10))).toDF()
    val frames = Multimodal.sampleFrames(media, 4).collect().sortBy(_.frame_idx)
    assert(frames.length === 4)
    val expectSrc = VideoCodec.sampleIndices(10, 4)
    frames.zipWithIndex.foreach { case (f, i) =>
      assert(f.data.toSeq === ImageCodec.syntheticPng(6L + 101L * expectSrc(i), 8, 8).toSeq)
    }
    // non-container payloads keep the stub row-count contract
    val stub = Seq(Multimodal.MediaRow(7L, "video", "plain text".getBytes,
      Multimodal.MediaMeta(8, 8, 1, 0, 3))).toDF()
    assert(Multimodal.sampleFrames(stub, 4).collect().length === 3)
  }
}
