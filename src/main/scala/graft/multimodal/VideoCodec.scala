package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** REAL video path — the third decodable modality (SURVEY.md §2.D12),
  * closing the last stub. The JDK ships no video codec, so the
  * container is our own deterministic format: a length-prefixed
  * sequence of REAL PNG frames
  *
  *   magic "GVID" | version u8 | fps i32 | frameCount i32 |
  *   { byteLen i32 | PNG bytes } × frameCount     (all big-endian)
  *
  * — a genuine demuxer walks the length prefixes, and every frame
  * decodes through [[ImageCodec]] (`javax.imageio`), so the
  * decode-side work (container parsing, per-frame image decode, frame
  * sampling) is real even though the codec inside each frame is PNG
  * rather than an inter-frame-predicted stream. Frame sampling uses
  * the same integer index map as [[AudioCodec.resampleNearest]]
  * (`src = i·n/k`, integer division), so a SQL oracle that never sees
  * the bytes can name exactly which source frames a sample run decoded
  * and what their pixel checksums must be.
  */
object VideoCodec {

  private val Magic = Array[Byte]('G', 'V', 'I', 'D')
  private val Version: Byte = 1
  /** Demux refuses containers past these bounds: a corrupt length
    * prefix must fail parsing, not allocate gigabytes on an executor.
    */
  val MaxFrames = 1 << 16
  val MaxFrameBytes = 1 << 26

  /** A demuxed container: per-frame ENCODED payloads (PNG bytes). */
  final case class Demuxed(fps: Int, frames: Vector[Array[Byte]])

  /** Mux encoded frame payloads into a container. */
  def mux(frames: Seq[Array[Byte]], fps: Int): Array[Byte] = {
    require(fps > 0 && frames.nonEmpty && frames.length <= MaxFrames,
      s"invalid clip: $fps fps × ${frames.length} frames")
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.write(Magic)
    out.writeByte(Version.toInt)
    out.writeInt(fps)
    out.writeInt(frames.length)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    out.flush()
    bos.toByteArray
  }

  /** Deterministic test clip, REALLY encoded: frame f is the synthetic
    * PNG with seed `seed + 101·f`, i.e. pixel(f, x, y) =
    * (seed + 101f + 7x + 13y) mod 256 — pure integer arithmetic an
    * oracle can restate without touching bytes.
    */
  def syntheticVideo(seed: Long, w: Int, h: Int, nFrames: Int, fps: Int = 24): Array[Byte] = {
    require(nFrames > 0, s"invalid frame count $nFrames")
    mux((0 until nFrames).map(f => ImageCodec.syntheticPng(seed + 101L * f, w, h)), fps)
  }

  /** Walk the container; None if the bytes are not a well-formed clip
    * (bad magic/version, truncation, or an insane length prefix) — one
    * bad blob in a batch must not kill a whole Spark task.
    */
  def tryDemux(data: Array[Byte]): Option[Demuxed] =
    try {
      val in = new DataInputStream(new ByteArrayInputStream(data))
      val magic = new Array[Byte](4)
      in.readFully(magic)
      if (!java.util.Arrays.equals(magic, Magic) || in.readByte() != Version) None
      else {
        val fps = in.readInt()
        val n = in.readInt()
        if (fps <= 0 || n <= 0 || n > MaxFrames) None
        else {
          val frames = Vector.newBuilder[Array[Byte]]
          var i = 0
          var ok = true
          while (ok && i < n) {
            val len = in.readInt()
            if (len < 0 || len > MaxFrameBytes) ok = false
            else {
              val buf = new Array[Byte](len)
              in.readFully(buf) // EOFException on truncation -> None
              frames += buf
              i += 1
            }
          }
          if (ok) Some(Demuxed(fps, frames.result())) else None
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None } // EOFException on truncation included

  /** Strict demux for payloads this library produced. */
  def demux(data: Array[Byte]): Demuxed =
    tryDemux(data).getOrElse(
      throw new IllegalArgumentException(s"not a decodable video container (${data.length} bytes)"))

  /** Source indices of a k-frame uniform sample over n frames:
    * `src = i·n/k` with integer division (k capped at n) — the 1-D
    * index map shared with the audio resampler, SQL-stateable.
    */
  def sampleIndices(nFrames: Int, k: Int): IndexedSeq[Int] = {
    require(nFrames > 0 && k > 0, s"invalid sample $k of $nFrames")
    val kk = math.min(k, nFrames)
    (0 until kk).map(i => i * nFrames / kk)
  }

  /** Demux + decode a uniform frame sample: (sourceIndex, decoded
    * raster) per sampled frame. The per-frame decode is the REAL
    * ImageIO path.
    */
  def frameSample(data: Array[Byte], maxFrames: Int): Seq[(Int, ImageCodec.Decoded)] = {
    val d = demux(data)
    sampleIndices(d.frames.length, maxFrames).map(src =>
      src -> ImageCodec.decode(d.frames(src)))
  }
}
