package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** D12: real codecs for all three modalities (PNG via ImageIO, WAV
  * PCM via javax.sound, GVID demux) behind real Spark plumbing
  * (schema, batch transform shapes, explode). Feature extraction is
  * decode-first; non-decodable payloads take the content-derived
  * byte-histogram fallback.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val media = Multimodal.mediaTable(
    Tables(spark, sf, "documents"), "doc_id", "text")

  test("media table has binary payload + typed meta, all modalities") {
    val schema = media.schema
    assert(schema("data").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    val mods = media.select("modality").distinct().collect().map(_.getString(0)).toSet
    assert(mods === Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic with unit batch shape") {
    val f1 = Multimodal.extractFeatures(media, 16).collect().map(r => r.doc_id -> r.features).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7), 16).collect().map(r => r.doc_id -> r.features).toMap
    assert(f1 === f2) // partitioning must not change results
    assert(f1.values.forall(_.size === 16))
    // all paths keep components in [0,1) — the q_multimodal_meta bound
    assert(f1.values.forall(_.forall(v => v >= 0f && v < 1f)))
  }

  test("decodable payloads get DECODED-domain features, not byte fallback") {
    import spark.implicits._
    import graft.multimodal.{AudioCodec, ImageCodec}
    // a constant-64 8x8 gray PNG: every intensity band must read
    // exactly 64/256, which no byte-histogram of the compressed PNG
    // stream could produce
    val png = ImageCodec.encodePng(ImageCodec.Decoded(8, 8, 1, Array.fill(64)(64)))
    val wav = AudioCodec.encodeWav(AudioCodec.Decoded(16000, 1, Array.fill(256)(-1024)))
    val rows = Seq(
      Multimodal.MediaRow(0L, "image", png, Multimodal.MediaMeta(8, 8, 1, 0, 1)),
      Multimodal.MediaRow(1L, "audio", wav, Multimodal.MediaMeta(0, 0, 1, 16000, 1)))
    val f = Multimodal.extractFeatures(rows.toDF(), 8).collect()
      .map(r => r.doc_id -> r.features).toMap
    assert(f(0L).forall(v => math.abs(v - 64f / 256f) < 1e-6))
    assert(f(1L).forall(v => math.abs(v - 1024f / 32769f) < 1e-6))
    // a non-decodable payload in the image modality falls back to byte
    // features instead of failing the task
    val junk = Seq(Multimodal.MediaRow(2L, "image",
      "not a png".getBytes("UTF-8"), Multimodal.MediaMeta(8, 8, 1, 0, 1))).toDF()
    val fb = Multimodal.extractFeatures(junk, 8).collect()
    assert(fb.length === 1 && fb(0).features.size === 8)
    assert(fb(0).features === Multimodal.ByteFallback.features("not a png".getBytes("UTF-8"), 8).toSeq)
  }

  test("resize rewrites image meta only") {
    val resized = Multimodal.resizeImages(media, 128, 128).toDF()
    val img = resized.filter(col("modality") === "image").select("meta.width").distinct().collect()
    assert(img.map(_.getInt(0)).toSeq === Seq(128))
    val vid = resized.filter(col("modality") === "video")
      .join(media.select(col("doc_id"), col("meta.width").as("w0")), "doc_id")
      .filter(col("meta.width") =!= col("w0")).count()
    assert(vid === 0) // non-images untouched
  }

  test("frame sampling explodes one row per frame, capped") {
    val frames = Multimodal.sampleFrames(media, 5).toDF()
    val perDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n"), max("frame_idx").as("mx"))
    val bad = perDoc.filter(col("n") > 5 || col("mx") >= 5).count()
    assert(bad === 0)
    assert(frames.count() > 0)
    // frame count equals min(nFrames, 5) per video
    val expected = media.filter(col("modality") === "video")
      .select(least(col("meta.nFrames"), lit(5)).as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(frames.count() === expected)
  }

  test("image phash: identical images collide on every band, degree counts partners") {
    import spark.implicits._
    // ids 0 and 768 render the SAME image (w period 24, h period 16,
    // pixel offset period 256 => lcm 768, and 768 % 3 == 0 keeps both
    // in the image modality); id 3 differs.
    val docs = Seq(0L, 3L, 768L).toDF("doc_id")
    val ph = Multimodal.imagePhashCandidates(docs)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(ph(0L).take(4) === ph(768L).take(4))
    assert(ph(0L).last.asInstanceOf[Long] >= 1L)
    assert(ph(768L).last.asInstanceOf[Long] >= 1L)
    // determinism across partitioning
    val again = Multimodal.imagePhashCandidates(docs.repartition(3))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(again === ph)
    // bands are 16-bit values
    for ((_, v) <- ph; b <- v.take(4))
      assert(b.asInstanceOf[Int] >= 0 && b.asInstanceOf[Int] < 65536)
  }

  test("audio fingerprint: formula replay, identical clips collide, partition invariance") {
    import spark.implicits._
    // ids 1 and 4915201 produce the SAME clip (n has period 200, the
    // sample formula period 65536; lcm·3 = 4915200 keeps id % 3 == 1),
    // id 4 differs.
    val docs = Seq(1L, 4L, 4915201L).toDF("doc_id")
    val fp = Multimodal.audioFingerprintCandidates(docs)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(fp(1L).take(4) === fp(4915201L).take(4))
    assert(fp(1L).last.asInstanceOf[Long] >= 1L)
    // independent pure-formula replay for id=1 (never touches the
    // codec): resample map src=i·n/256, |sample| energies over 64
    // windows of 4, strict>floor-mean bits into four 16-bit bands
    val id = 1L
    val n = (id % 200 + 50).toInt
    val energy = new Array[Long](64)
    for (i <- 0 until 256) {
      val src = (i.toLong * n / 256).toInt
      val s = (((id + 37L * src) % 65536L) - 32768L).toInt
      energy(i / 4) += math.abs(s)
    }
    val mean = energy.sum / 64
    val want = new Array[Int](4)
    for (w <- 0 until 64) if (energy(w) > mean) want(w / 16) |= 1 << (w % 16)
    assert(fp(1L).take(4) === want.toSeq)
    // determinism across partitioning; bands are 16-bit values
    val again = Multimodal.audioFingerprintCandidates(docs.repartition(3))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(again === fp)
    for ((_, v) <- fp; b <- v.take(4))
      assert(b.asInstanceOf[Int] >= 0 && b.asInstanceOf[Int] < 65536)
  }

  test("video phash: identical videos collide per frame position, degree counts partners") {
    import spark.implicits._
    // ids 2 and 3842 render the SAME video (w period 16, h period 12,
    // nf period 30, pixel offset period 256 => lcm 3840; 3840 % 3 == 0
    // keeps both in the video modality); id 5 differs.
    val docs = Seq(2L, 5L, 3842L).toDF("doc_id")
    val ph = Multimodal.videoPhashCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.toSeq.drop(2)).toMap
    val frames2 = ph.keys.filter(_._1 == 2L).map(_._2).toSeq.sorted
    assert(frames2.nonEmpty)
    for (f <- frames2) {
      assert(ph((2L, f)) === ph((3842L, f)))
      assert(ph((2L, f)).last.asInstanceOf[Long] >= 1L)
    }
    val again = Multimodal.videoPhashCandidates(docs.repartition(3))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.toSeq.drop(2)).toMap
    assert(again === ph)
  }
}
