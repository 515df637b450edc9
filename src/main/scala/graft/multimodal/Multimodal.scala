package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing for training-data pipelines
  * (SURVEY.md §2.D12): media payloads ride as opaque `binary` columns
  * next to a typed metadata struct; decode / feature-extraction /
  * resize / frame-sampling run as typed `mapPartitions` batch
  * transforms (the Scala-native equivalent of a vectorized UDF —
  * per-partition setup cost amortizes the way a codec handle would).
  *
  * All THREE modality paths are REAL: [[ImageCodec]] encodes/decodes
  * genuine PNG bytes through the JDK's `javax.imageio` (see
  * [[imageDecodeTable]], [[imagePhashTable]], [[resizeImages]]),
  * [[AudioCodec]] encodes/decodes genuine RIFF/WAV PCM through
  * `javax.sound.sampled` (see [[audioDecodeTable]],
  * [[audioFingerprintTable]], [[resampleAudio]]), and [[VideoCodec]]
  * demuxes GVID containers of real PNG frames (see
  * [[videoFrameTable]], [[videoPhashTable]], [[sampleFrames]]).
  * Feature extraction ([[extractFeatures]]) decodes payloads through
  * those codecs and reduces DECODED pixels/samples/frames to a
  * fixed-dim profile vector. Payloads that do not decode (this
  * table's text stand-ins, corrupt blobs in a real corpus) fall back
  * to [[ByteFallback]] — content-derived byte-histogram features and
  * proportional byte slices — so one bad blob degrades to a weaker
  * feature instead of killing the task.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, channels: Int,
      sampleRate: Int, nFrames: Int)
  final case class MediaRow(doc_id: Long, modality: String,
      data: Array[Byte], meta: MediaMeta)
  final case class FeatureRow(doc_id: Long, modality: String,
      features: Seq[Float], feature_norm: Double)
  final case class FrameRow(doc_id: Long, frame_idx: Int, data: Array[Byte])

  /** Fallback transforms for payloads that do NOT decode through any
    * codec (text stand-ins in testdata, corrupt blobs at 100 TB).
    * These are content-derived — a byte histogram IS a real feature of
    * an opaque payload (the same family language-ID uses) — but weaker
    * than decoded-domain features; the decode-first paths in
    * [[extractFeatures]] / [[resizeImages]] / [[sampleFrames]] always
    * win when the bytes parse.
    */
  object ByteFallback {

    /** Content-derived byte features, every component in [0, 1):
      * first half = byte-value histogram folded into dim/2 buckets,
      * second half = order-sensitive byte-bigram histogram — two
      * payloads with the same bytes in different order differ.
      * Denominator is len+1 so a single-bucket payload stays < 1.
      */
    def features(data: Array[Byte], dim: Int): Array[Float] = {
      require(dim >= 2, s"feature dim must be >= 2, got $dim")
      val half = dim / 2
      val counts = new Array[Int](dim)
      var i = 0
      while (i < data.length) {
        counts((data(i) & 0xff) % half) += 1
        if (i > 0)
          counts(half + ((data(i - 1) & 0xff) * 31 + (data(i) & 0xff)) % (dim - half)) += 1
        i += 1
      }
      val out = new Array[Float](dim)
      val denom = (data.length + 1).toFloat
      i = 0
      while (i < dim) { out(i) = counts(i) / denom; i += 1 }
      out
    }

    def resize(data: Array[Byte], fromMeta: MediaMeta, w: Int, h: Int): Array[Byte] = {
      // non-decodable payload: keep a proportional byte slice so the
      // size contract tracks the metadata the way a re-encode would
      val ratio = (w.toLong * h) / math.max(1L, fromMeta.width.toLong * fromMeta.height)
      java.util.Arrays.copyOf(data, math.max(1, (data.length * math.min(1L, ratio)).toInt))
    }

    def frame(data: Array[Byte], idx: Int): Array[Byte] =
      Array[Byte]((idx & 0xff).toByte, if (data.isEmpty) 0 else data(idx % data.length))
  }

  /** Build a media table from any table with an id and a payload-ish
    * string column — testdata stand-in for real blob ingestion. Meta
    * is typed and deterministic.
    */
  def mediaTable(docs: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val mod = pmod(col(idCol), lit(3))
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      when(mod === 0, "image").when(mod === 1, "audio").otherwise("video").as("modality"),
      col(payloadCol).cast("binary").as("data"),
      struct(
        (pmod(col(idCol), lit(640)) + 32).cast("int").as("width"),
        (pmod(col(idCol), lit(480)) + 32).cast("int").as("height"),
        lit(3).as("channels"),
        when(mod === 1, 16000).otherwise(0).as("sampleRate"),
        when(mod === 2, pmod(col(idCol), lit(30)) + 1).otherwise(1).cast("int").as("nFrames")
      ).as("meta"))
  }

  /** Fixed-dim band profile over a decoded signal: position i maps to
    * band i·dim/n (integer division — the same index arithmetic as
    * the codecs' nearest resize), each band reports its mean value
    * over `scale`. `scale` strictly exceeds the max signal value, so
    * every component sits in [0, 1) — the invariant the
    * q_multimodal_meta norm bound rides on.
    */
  private def bandProfile(n: Int, dim: Int, value: Int => Double,
      scale: Double): Array[Float] = {
    val out = new Array[Float](dim)
    if (n == 0) return out
    val sums = new Array[Double](dim)
    val cnt = new Array[Int](dim)
    var i = 0
    while (i < n) {
      val b = (i.toLong * dim / n).toInt
      sums(b) += value(i)
      cnt(b) += 1
      i += 1
    }
    var b = 0
    while (b < dim) {
      if (cnt(b) > 0) out(b) = (sums(b) / cnt(b) / scale).toFloat
      b += 1
    }
    out
  }

  /** Decode + feature-extract in partition batches. Decode-first, per
    * modality: images reduce DECODED pixels to a dim-band intensity
    * profile, audio reduces DECODED PCM samples to a dim-band
    * |amplitude| profile, video demuxes and reduces per-frame decoded
    * mean intensities to a dim-band temporal profile. Payloads that
    * fail their codec fall back to [[ByteFallback.features]] (byte
    * histograms) instead of failing the task. Every path keeps
    * components in [0, 1), so `feature_norm < sqrt(dim)` regardless
    * of which path ran.
    */
  def extractFeatures(media: DataFrame, dim: Int): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // codec handles are JVM-static (ImageIO/AudioSystem); per-row
      // streams are memory-backed (ImageIO.setUseCache(false))
      rows.map { r =>
        val f = r.modality match {
          case "image" =>
            ImageCodec.tryDecode(r.data)
              .map(img => bandProfile(img.pixels.length, dim,
                i => img.pixels(i).toDouble, 256.0))
              .getOrElse(ByteFallback.features(r.data, dim))
          case "audio" =>
            AudioCodec.tryDecode(r.data)
              // 16-bit PCM: |sample| <= 32768 (Short.MinValue), so the
              // strict < 1 bound needs 32769
              .map(c => bandProfile(c.samples.length, dim,
                i => math.abs(c.samples(i).toDouble), 32769.0))
              .getOrElse(ByteFallback.features(r.data, dim))
          case "video" =>
            VideoCodec.tryDemux(r.data)
              .map { clip =>
                val means = clip.frames.map(fb =>
                  ImageCodec.tryDecode(fb)
                    .map(d => ImageCodec.pixelSum(d).toDouble / d.pixels.length)
                    .getOrElse(0.0))
                bandProfile(means.length, dim, i => means(i), 256.0)
              }
              .getOrElse(ByteFallback.features(r.data, dim))
          case _ => ByteFallback.features(r.data, dim)
        }
        var s = 0.0
        var i = 0
        while (i < f.length) { s += f(i).toDouble * f(i); i += 1 }
        FeatureRow(r.doc_id, r.modality, f.toSeq, math.sqrt(s))
      }
    }
  }

  /** Resize every image payload; non-images pass through. Payloads
    * that really decode (PNG/JPEG via [[ImageCodec]]) get a REAL
    * nearest-neighbor resize and PNG re-encode; non-decodable bytes
    * (this table's text stand-ins) fall back to the byte slice so the
    * metadata contract still holds.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      if (r.modality != "image") r
      else ImageCodec.tryDecode(r.data) match {
        case Some(img) =>
          r.copy(data = ImageCodec.encodePng(ImageCodec.resizeNearest(img, w, h)),
            meta = r.meta.copy(width = w, height = h, channels = img.channels))
        case None =>
          r.copy(data = ByteFallback.resize(r.data, r.meta, w, h),
            meta = r.meta.copy(width = w, height = h))
      }
    })
  }

  final case class ImageDecodeRow(doc_id: Long, width: Int, height: Int,
      channels: Int, pixel_sum: Long, resized_sum: Long)

  /** REAL image decode path (no stub): every image-modality doc gets a
    * deterministic grayscale PNG (pixel = (doc_id + 7x + 13y) mod 256,
    * genuinely encoded by ImageIO), which is decoded BACK through
    * ImageIO and reduced to decoded dims + pixel checksums — plus the
    * checksum after a real nearest-neighbor resize to `rw`×`rh`.
    * Because PNG is lossless and the resize index map is pure integer
    * arithmetic, an oracle that never touches the bytes can recompute
    * both sums — proving the encode→decode→resize loop is bit-exact.
    */
  def imageDecodeTable(docs: DataFrame, rw: Int = 8, rh: Int = 6): Dataset[ImageDecodeRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { ids =>
        // per-partition: ImageIO reader/writer instances amortize here
        ids.map { id =>
          val w = (id % 24 + 8).toInt
          val h = (id % 16 + 8).toInt
          val png = ImageCodec.syntheticPng(id, w, h)
          val dec = ImageCodec.decode(png)
          val rs = ImageCodec.resizeNearest(dec, rw, rh)
          ImageDecodeRow(id, dec.width, dec.height, dec.channels,
            ImageCodec.pixelSum(dec), ImageCodec.pixelSum(rs))
        }
      }
  }

  final case class ImagePhashRow(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** D43 — perceptual average-hash (aHash) over REALLY decoded images:
    * decode the PNG, nearest-resize to 8×8, threshold each pixel
    * against the floor-mean of the 64 samples (strictly greater), and
    * pack the 64 bits row-major into four 16-bit band values — which
    * are simultaneously the LSH banding key for near-dup candidate
    * search (two images are candidates iff they agree on at least one
    * band, the same band-join shape as MinHash D2). Every step is
    * integer arithmetic over losslessly-decoded samples, so a SQL
    * oracle that never sees the bytes replays hash AND banding.
    */
  def imagePhashTable(docs: DataFrame): Dataset[ImagePhashRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (id % 24 + 8).toInt
          val h = (id % 16 + 8).toInt
          val rs = ImageCodec.resizeNearest(
            ImageCodec.decode(ImageCodec.syntheticPng(id, w, h)), 8, 8)
          val mean = rs.pixels.map(_.toLong).sum / 64
          val bands = new Array[Int](4)
          var i = 0
          while (i < 64) {
            if (rs.pixels(i) > mean) bands(i / 16) |= 1 << (i % 16)
            i += 1
          }
          ImagePhashRow(id, bands(0), bands(1), bands(2), bands(3))
        }
      }
  }

  /** Per-image hash bands plus the LSH candidate degree: how many
    * OTHER images share at least one band. The codec runs once per
    * image; banding multiplies rows by 4 only; the candidate join
    * shuffles (band, value, doc_id) fixed-width rows — the D2 scale
    * shape applied to the image modality.
    */
  def imagePhashCandidates(docs: DataFrame): DataFrame = {
    val ph = imagePhashTable(docs).toDF().localCheckpoint()
    val bands = ph.select(col("doc_id"), posexplode(
      array(col("b0"), col("b1"), col("b2"), col("b3"))).as(Seq("band", "v")))
    val deg = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("partner"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_cand"))
    ph.join(deg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("b0"), col("b1"), col("b2"), col("b3"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"))
  }

  /** D86 — image near-dup CLUSTERS end-to-end: aHash band agreement
    * (≥ `minBands` of 4 — the integer stand-in for a Hamming bound)
    * proposes pairs, connected components makes them transitive, and
    * every image doc lands in a cluster (singletons alone) — the
    * apply-side of D43 that a dedup pipeline actually consumes, with
    * re-encoded/copied images collapsing into one keepable group.
    * Scale shape: codec once per image, band join over fixed-width
    * rows, the D15 min-label CC on the (sparse) pair graph.
    */
  def imageClusters(docs: DataFrame, minBands: Int = 3): DataFrame = {
    val ph = imagePhashTable(docs).toDF().localCheckpoint()
    val bands = ph.select(col("doc_id"), posexplode(
      array(col("b0"), col("b1"), col("b2"), col("b3"))).as(Seq("band", "v")))
    val pairs = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("nb"))
      .filter(col("nb") >= minBands)
      .select("d1", "d2")
    graft.operators.Components.clusterDocuments(
      docs.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select(col("doc_id").cast("long").as("doc_id")),
      "doc_id", pairs)
  }

  final case class VideoPhashRow(doc_id: Long, frame_idx: Int, src_frame: Int,
      b0: Int, b1: Int, b2: Int, b3: Int)

  /** D50 — video perceptual hashing: demux the REAL container, decode
    * a uniform frame sample through the REAL image path, and aHash
    * each sampled frame exactly as [[imagePhashTable]] does (8×8
    * nearest-resize, strict>floor-mean bits, four 16-bit bands). A
    * video's fingerprint is its per-position frame hashes; two videos
    * are near-dup candidates when any (frame position, band) value
    * collides — the keying that catches re-encoded/trimmed-tail
    * copies without ever comparing pixels across the corpus.
    */
  def videoPhashTable(docs: DataFrame, maxFrames: Int = 4): Dataset[VideoPhashRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(pmod(col("doc_id"), lit(3)) === 2)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val w = (id % 16 + 8).toInt
          val h = (id % 12 + 8).toInt
          val nf = (id % 30 + 1).toInt
          val clip = VideoCodec.syntheticVideo(id, w, h, nf)
          VideoCodec.frameSample(clip, maxFrames).zipWithIndex.map {
            case ((src, dec), idx) =>
              val rs = ImageCodec.resizeNearest(dec, 8, 8)
              val mean = rs.pixels.map(_.toLong).sum / 64
              val bands = new Array[Int](4)
              var i = 0
              while (i < 64) {
                if (rs.pixels(i) > mean) bands(i / 16) |= 1 << (i % 16)
                i += 1
              }
              VideoPhashRow(id, idx, src, bands(0), bands(1), bands(2), bands(3))
          }
        }
      }
  }

  /** Per-frame hash bands plus the candidate degree: how many OTHER
    * videos collide on this (frame position, band) key. Same LSH
    * economics as D2/D43 — the codec touches each payload once,
    * banding multiplies rows by 4, and the join moves fixed-width
    * (frame_idx, band, v, doc_id) rows only.
    */
  def videoPhashCandidates(docs: DataFrame, maxFrames: Int = 4): DataFrame = {
    val ph = videoPhashTable(docs, maxFrames).toDF().localCheckpoint()
    val bands = ph.select(col("doc_id"), col("frame_idx"), posexplode(
      array(col("b0"), col("b1"), col("b2"), col("b3"))).as(Seq("band", "v")))
    val deg = bands.as("a").join(bands.as("b"),
        col("a.frame_idx") === col("b.frame_idx") &&
          col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id"), col("a.frame_idx").as("frame_idx"),
        col("b.doc_id").as("partner"))
      .distinct()
      .groupBy("doc_id", "frame_idx").agg(count(lit(1)).as("n_cand"))
    ph.join(deg, Seq("doc_id", "frame_idx"), "left")
      .select(col("doc_id"), col("frame_idx"), col("src_frame"),
        col("b0"), col("b1"), col("b2"), col("b3"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"))
  }

  final case class AudioDecodeRow(doc_id: Long, sample_rate: Int, channels: Int,
      n_samples: Int, sample_sum: Long, resampled_sum: Long)

  /** REAL audio decode path (no stub): every audio-modality doc gets a
    * deterministic mono 16-bit WAV clip (sample = ((doc_id + 37i) mod
    * 65536) − 32768, genuinely encoded through `javax.sound.sampled`),
    * which is decoded BACK through AudioSystem and reduced to format
    * fields + sample checksums — plus the checksum after a real
    * nearest-neighbor resample to `rn` samples. WAV/PCM is lossless
    * and the resample index map is pure integer arithmetic, so an
    * oracle that never touches the bytes can recompute both sums —
    * proving the encode→decode→resample loop is bit-exact (the audio
    * counterpart of [[imageDecodeTable]]).
    */
  def audioDecodeTable(docs: DataFrame, rn: Int = 40): Dataset[AudioDecodeRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(pmod(col("doc_id"), lit(3)) === 1)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { ids =>
        // per-partition: AudioSystem reader setup amortizes here
        ids.map { id =>
          val n = (id % 200 + 50).toInt
          val wav = AudioCodec.syntheticWav(id, 16000, n)
          val dec = AudioCodec.decode(wav)
          val rs = AudioCodec.resampleNearest(dec, rn)
          AudioDecodeRow(id, dec.sampleRate, dec.channels, dec.samples.length,
            AudioCodec.sampleSum(dec), AudioCodec.sampleSum(rs))
        }
      }
  }

  final case class AudioFprintRow(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  /** D72 — audio near-dup fingerprinting over REALLY decoded PCM: the
    * audio analogue of the image aHash (D43) / video phash (D50).
    * Decode the WAV through AudioSystem, nearest-resample to a fixed
    * 256 samples, sum |sample| over 64 windows of 4 (the integer
    * stand-in for per-window energy), threshold each window against
    * the floor-mean of the 64 energies (strictly greater), and pack
    * the 64 bits window-major into four 16-bit bands — simultaneously
    * the LSH banding key for candidate search (two clips are
    * candidates iff they agree on at least one band, the D2/D43 band
    * join). Time-normalizing via the resample makes the signature
    * length-invariant, the energy profile makes it amplitude-shape
    * sensitive; every step is integer arithmetic over losslessly
    * decoded samples, so a SQL oracle that never sees the bytes
    * replays hash AND banding.
    */
  def audioFingerprintTable(docs: DataFrame): Dataset[AudioFprintRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(pmod(col("doc_id"), lit(3)) === 1)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val n = (id % 200 + 50).toInt
          val rs = AudioCodec.resampleNearest(
            AudioCodec.decode(AudioCodec.syntheticWav(id, 16000, n)), 256)
          val energy = new Array[Long](64)
          var i = 0
          while (i < 256) { energy(i / 4) += math.abs(rs.samples(i)); i += 1 }
          val mean = energy.sum / 64
          val bands = new Array[Int](4)
          var w = 0
          while (w < 64) {
            if (energy(w) > mean) bands(w / 16) |= 1 << (w % 16)
            w += 1
          }
          AudioFprintRow(id, bands(0), bands(1), bands(2), bands(3))
        }
      }
  }

  /** Per-clip fingerprint bands plus the LSH candidate degree: how
    * many OTHER clips share at least one band. The codec touches each
    * payload once; banding multiplies rows by 4 only; the candidate
    * join moves fixed-width (band, v, doc_id) rows — the D2/D43 scale
    * shape applied to the audio modality.
    */
  def audioFingerprintCandidates(docs: DataFrame): DataFrame = {
    val ph = audioFingerprintTable(docs).toDF().localCheckpoint()
    val bands = ph.select(col("doc_id"), posexplode(
      array(col("b0"), col("b1"), col("b2"), col("b3"))).as(Seq("band", "v")))
    val deg = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("partner"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("n_cand"))
    ph.join(deg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("b0"), col("b1"), col("b2"), col("b3"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"))
  }

  /** Resample every audio payload to `n` samples; non-audio passes
    * through. Payloads that really decode (WAV via [[AudioCodec]]) get
    * a REAL nearest-neighbor resample and WAV re-encode; non-decodable
    * bytes (this table's text stand-ins) fall back to the byte slice so the
    * metadata contract still holds — the audio mirror of
    * [[resizeImages]].
    */
  def resampleAudio(media: DataFrame, n: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map { r =>
      if (r.modality != "audio") r
      else AudioCodec.tryDecode(r.data) match {
        case Some(clip) =>
          val rs = AudioCodec.resampleNearest(clip, n)
          // decoded clip is mono (tryDecode mixes down) — meta must
          // agree with the re-encoded bytes, not the original container
          r.copy(data = AudioCodec.encodeWav(rs),
            meta = r.meta.copy(sampleRate = clip.sampleRate, nFrames = n,
              channels = clip.channels))
        case None =>
          r.copy(data = ByteFallback.resize(r.data, r.meta, n, 1),
            meta = r.meta.copy(nFrames = n))
      }
    })
  }

  /** Sample up to `maxFrames` frames per video row (one output row per
    * frame — the explode shape a frame-level pipeline needs). Payloads
    * that really demux (GVID containers via [[VideoCodec]]) get a REAL
    * uniform frame sample — each emitted row carries the frame's
    * actual encoded PNG bytes; non-container payloads (this table's
    * text stand-ins) fall back to the byte slice so the row-count contract
    * (min(maxFrames, meta.nFrames) rows per video) still holds.
    */
  def sampleFrames(media: DataFrame, maxFrames: Int): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].filter(_.modality == "video").flatMap { r =>
      VideoCodec.tryDemux(r.data) match {
        case Some(clip) =>
          VideoCodec.sampleIndices(clip.frames.length, maxFrames).zipWithIndex.map {
            case (src, i) => FrameRow(r.doc_id, i, clip.frames(src))
          }
        case None =>
          val n = math.min(maxFrames, r.meta.nFrames)
          (0 until n).map(i => FrameRow(r.doc_id, i, ByteFallback.frame(r.data, i)))
      }
    }
  }

  final case class VideoFrameRow(doc_id: Long, frame_idx: Int, src_frame: Int,
      width: Int, height: Int, pixel_sum: Long)

  /** REAL video decode path (no stub): every video-modality doc gets a
    * deterministic GVID clip (nFrames = doc_id mod 30 + 1 — the same
    * count mediaTable puts in meta — of REAL PNG frames, pixel =
    * (doc_id + 101·frame + 7x + 13y) mod 256), which is genuinely
    * DEMUXED, uniform-sampled to ≤ `maxFrames` frames
    * (src = i·n/k integer map), and each sampled frame decoded back
    * through ImageIO to its pixel checksum. PNG is lossless and every
    * index map is integer arithmetic, so an oracle that never touches
    * the bytes can recompute which frames were decoded and their exact
    * sums — the video counterpart of [[imageDecodeTable]] /
    * [[audioDecodeTable]], closing D12's last stubbed modality.
    */
  def videoFrameTable(docs: DataFrame, maxFrames: Int = 4): Dataset[VideoFrameRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(pmod(col("doc_id"), lit(3)) === 2)
      .select(col("doc_id").cast("long")).as[Long]
      .mapPartitions { ids =>
        // per-partition: ImageIO reader instances amortize here
        ids.flatMap { id =>
          val w = (id % 16 + 8).toInt
          val h = (id % 12 + 8).toInt
          val nf = (id % 30 + 1).toInt
          val clip = VideoCodec.syntheticVideo(id, w, h, nf)
          VideoCodec.frameSample(clip, maxFrames).zipWithIndex.map {
            case ((src, dec), i) =>
              VideoFrameRow(id, i, src, dec.width, dec.height, ImageCodec.pixelSum(dec))
          }
        }
      }
  }

  /** Per-modality rollup used by the q_multimodal_meta gate. The
    * metadata aggregates (n, bytes, width) are exact and oracle-
    * derivable; the feature-extraction plumbing is verified by the
    * same contract move as q_approx_distinct: every row must round-
    * trip the Dataset[FeatureRow] pass with the requested dim, and
    * every norm must sit in [0, sqrt(dim)) — values in [0,1) —
    * so `norms_valid` is TRUE iff the mapPartitions pass really ran
    * over every payload (exact decoded-domain feature values stay
    * spec-pinned in MultimodalSpec).
    */
  def modalitySummary(spark: SparkSession, docs: DataFrame): DataFrame = {
    val dim = 16
    val media = mediaTable(docs, "doc_id", "text")
    val feats = extractFeatures(media, dim).toDF()
    media.join(feats.select(col("doc_id"), col("feature_norm"),
        size(col("features")).as("fdim")), "doc_id")
      .groupBy("modality")
      .agg(count(lit(1)).as("n"),
        sum(length(col("data"))).as("total_bytes"),
        avg(col("meta.width")).as("avg_width"),
        min("fdim").as("min_dim"),
        max("fdim").as("max_dim"),
        (min("feature_norm") >= 0.0 &&
          max("feature_norm") < math.sqrt(dim.toDouble)).as("norms_valid"))
      .orderBy("modality")
  }
}
