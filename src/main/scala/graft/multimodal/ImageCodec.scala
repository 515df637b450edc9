package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

/** REAL image codec over the JDK's `javax.imageio` — no external
  * dependency. This replaces the deterministic stub for the image
  * modality (reference: multimodal decode/feature paths; SURVEY.md
  * §2.D12): payloads are genuine PNG bytes, decode reads them back
  * through ImageIO, and resize is nearest-neighbor over the DECODED
  * raster (index map `src = dst * srcDim / dstDim`, integer division —
  * the same arithmetic an oracle can state in SQL).
  *
  * Everything stays deterministic: PNG is lossless, TYPE_BYTE_GRAY has
  * one 8-bit band, and nearest-neighbor has no filter kernel — so a
  * decoded pixel checksum is exactly reproducible by an engine that
  * never saw the bytes. Video/audio remain stubbed (no in-JDK codec).
  */
object ImageCodec {

  // ImageIO defaults to a DISK-backed stream cache: every read/write
  // from a memory stream round-trips a temp file. All graft payloads
  // are in-memory byte arrays, so the cache is pure overhead — on the
  // sf0.1 bench it roughly doubles per-frame decode cost across the
  // image AND video gates (every VideoCodec frame decodes through
  // here). One JVM-global switch, set when the codec class loads.
  javax.imageio.ImageIO.setUseCache(false)

  /** Decoded grayscale image: one 0..255 sample per pixel, row-major. */
  final case class Decoded(width: Int, height: Int, channels: Int, pixels: Array[Int])

  /** Deterministic grayscale test image, REALLY encoded to PNG via
    * ImageIO: pixel(x, y) = (seed + 7x + 13y) mod 256.
    */
  def syntheticPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"invalid image dims ${w}x$h")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, (((seed + 7L * x + 13L * y) % 256) + 256) % 256)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode any ImageIO-supported payload to grayscale samples; None if
    * the bytes are not a decodable image. ImageIO signals that two
    * ways — null for an unknown signature, IIOException (or a reader
    * RuntimeException) for a recognized-but-corrupt payload (e.g. a
    * truncated PNG) — and both must map to None, or one bad blob in a
    * batch kills the whole Spark task.
    */
  def tryDecode(data: Array[Byte]): Option[Decoded] = {
    val read =
      try Option(ImageIO.read(new ByteArrayInputStream(data)))
      catch { case scala.util.control.NonFatal(_) => None }
    read.map { img =>
      val w = img.getWidth
      val h = img.getHeight
      val bands = img.getRaster.getNumBands
      val px = new Array[Int](w * h)
      if (img.getType == BufferedImage.TYPE_BYTE_GRAY) {
        img.getRaster.getSamples(0, 0, w, h, 0, px)
      } else {
        // mixed-band images: integer-mean luminance, still exact math
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            var s = 0
            var b = 0
            while (b < bands) { s += img.getRaster.getSample(x, y, b); b += 1 }
            px(y * w + x) = s / bands
            x += 1
          }
          y += 1
        }
      }
      Decoded(w, h, bands, px)
    }
  }

  def decode(data: Array[Byte]): Decoded =
    tryDecode(data).getOrElse(
      throw new IllegalArgumentException("payload is not a decodable image"))

  /** Nearest-neighbor resize on decoded samples: dst (x, y) takes src
    * (x*srcW/dstW, y*srcH/dstH) with integer division.
    */
  def resizeNearest(img: Decoded, w: Int, h: Int): Decoded = {
    require(w > 0 && h > 0, s"invalid resize dims ${w}x$h")
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val sy = y * img.height / h
      var x = 0
      while (x < w) {
        out(y * w + x) = img.pixels(sy * img.width + x * img.width / w)
        x += 1
      }
      y += 1
    }
    Decoded(w, h, img.channels, out)
  }

  /** Re-encode decoded samples back to PNG bytes (gray). */
  def encodePng(img: Decoded): Array[Byte] = {
    val b = new BufferedImage(img.width, img.height, BufferedImage.TYPE_BYTE_GRAY)
    b.getRaster.setSamples(0, 0, img.width, img.height, 0, img.pixels)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(b, "png", bos)
    bos.toByteArray
  }

  def pixelSum(img: Decoded): Long = {
    var s = 0L
    var i = 0
    while (i < img.pixels.length) { s += img.pixels(i); i += 1 }
    s
  }
}
