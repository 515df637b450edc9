package graft

import graft.multimodal.{ImageCodec, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** The D12 image path is REAL (javax.imageio): these pin the lossless
  * PNG roundtrip, the nearest-neighbor index map, and the gate table's
  * end-to-end determinism under repartitioning.
  */
class ImageCodecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("PNG encode→decode roundtrip is lossless for every sample") {
    for (seed <- Seq(0L, 7L, 123L); (w, h) <- Seq((8, 8), (31, 9), (24, 17))) {
      val dec = ImageCodec.decode(ImageCodec.syntheticPng(seed, w, h))
      assert(dec.width === w)
      assert(dec.height === h)
      assert(dec.channels === 1)
      for (y <- 0 until h; x <- 0 until w)
        assert(dec.pixels(y * w + x) === ((seed + 7L * x + 13L * y) % 256).toInt,
          s"seed=$seed ($x,$y)")
    }
  }

  test("garbage bytes are not a decodable image") {
    assert(ImageCodec.tryDecode("not a png at all".getBytes).isEmpty)
    assert(ImageCodec.tryDecode(Array.emptyByteArray).isEmpty)
    // recognized signature but corrupt body: ImageIO THROWS here
    // (IIOException), and that must map to None too — one bad blob
    // must not kill a whole partition
    val truncated = ImageCodec.syntheticPng(5L, 16, 16).take(40)
    assert(ImageCodec.tryDecode(truncated).isEmpty)
  }

  test("nearest-neighbor resize uses src = dst*srcDim/dstDim integer map") {
    val src = ImageCodec.decode(ImageCodec.syntheticPng(42L, 20, 12))
    val rs = ImageCodec.resizeNearest(src, 8, 6)
    assert(rs.width === 8 && rs.height === 6)
    for (y <- 0 until 6; x <- 0 until 8) {
      val sx = x * 20 / 8
      val sy = y * 12 / 6
      assert(rs.pixels(y * 8 + x) === src.pixels(sy * 20 + sx), s"($x,$y)")
    }
  }

  test("re-encoded resize survives a second decode bit-exactly") {
    val src = ImageCodec.decode(ImageCodec.syntheticPng(9L, 16, 10))
    val rs = ImageCodec.resizeNearest(src, 4, 4)
    val again = ImageCodec.decode(ImageCodec.encodePng(rs))
    assert(again.pixels.toSeq === rs.pixels.toSeq)
  }

  test("imageDecodeTable is deterministic and partition-invariant") {
    val docs = Tables(spark, sf, "documents")
    val a = Multimodal.imageDecodeTable(docs).collect()
      .map(r => r.doc_id -> ((r.width, r.height, r.pixel_sum, r.resized_sum))).toMap
    val b = Multimodal.imageDecodeTable(docs.repartition(7)).collect()
      .map(r => r.doc_id -> ((r.width, r.height, r.pixel_sum, r.resized_sum))).toMap
    assert(a === b)
    assert(a.nonEmpty)
    // spot-check one row against the closed form
    val (id, (w, h, psum, _)) = a.head
    val expect = (for (y <- 0 until h; x <- 0 until w)
      yield (id + 7L * x + 13L * y) % 256).sum
    assert(w === (id % 24 + 8).toInt && h === (id % 16 + 8).toInt)
    assert(psum === expect)
  }

  test("resizeImages really re-encodes decodable payloads") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(0L, "image", ImageCodec.syntheticPng(0L, 20, 12),
        Multimodal.MediaMeta(20, 12, 1, 0, 1)),
      Multimodal.MediaRow(1L, "image", "not an image".getBytes,
        Multimodal.MediaMeta(10, 10, 3, 0, 1))).toDF()
    val out = Multimodal.resizeImages(media, 8, 6).collect().map(r => r.doc_id -> r).toMap
    val real = ImageCodec.decode(out(0L).data)
    assert(real.width === 8 && real.height === 6)
    val expect = ImageCodec.resizeNearest(ImageCodec.decode(
      ImageCodec.syntheticPng(0L, 20, 12)), 8, 6)
    assert(real.pixels.toSeq === expect.pixels.toSeq)
    // non-decodable payload still gets the stub contract
    assert(out(1L).meta.width === 8 && out(1L).meta.height === 6)
  }
}
