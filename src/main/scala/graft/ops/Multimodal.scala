package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque BINARY plus typed
  * metadata. The Spark-side plumbing (schema, partition-parallel batch
  * processing, column pruning) is real, and the codec is PLUGGABLE:
  * set the Spark conf `graft.media.decoder` to the fully-qualified
  * class name of a [[Multimodal.MediaDecoder]] and every
  * decode/feature call routes through it.
  *
  * Two decoders ship here: [[Multimodal.ImageIoDecoder]] — REAL
  * image decoding via the JDK's own javax.imageio (no external
  * libraries), exact width/height/channels and a pixel-derived
  * feature for any PNG/JPEG/GIF/BMP payload — and the default
  * [[Multimodal.StubDecoder]], a deterministic fake keyed on the
  * content hash for payload kinds no JDK codec covers (video/audio
  * containers; clearly marked below). The bench/test corpus is
  * synthetic magic-bytes-plus-noise, so the stub stays the default
  * there; a real deployment flips one conf key.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  final case class ImageMeta(
      media_id: Long, width: Int, height: Int, channels: Int, format: String)

  final case class AudioMeta(media_id: Long, sample_rate: Int, channels: Int,
      frames: Long, duration_ms: Long, format: String)

  final case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long,
      feature: Array[Float])

  /** Codec contract. Implementations ship to executors inside task
    * closures, so they must be Serializable and constructible with a
    * no-arg constructor. `decodeAudio` defaults to the stub so
    * image-only decoders (and injected test fakes) stay source-
    * compatible.
    */
  trait MediaDecoder extends Serializable {
    def decodeMeta(mediaId: Long, payload: Array[Byte]): ImageMeta
    def feature(payload: Array[Byte], dim: Int): Array[Float]
    def decodeAudio(mediaId: Long, payload: Array[Byte]): AudioMeta =
      stubDecodeAudio(mediaId, payload)
  }

  /** the default: deterministic fake decode (no codec libs here) */
  final class StubDecoder extends MediaDecoder {
    override def decodeMeta(mediaId: Long, payload: Array[Byte]): ImageMeta =
      stubDecodeMeta(mediaId, payload)
    override def feature(payload: Array[Byte], dim: Int): Array[Float] =
      stubFeature(payload, dim)
  }

  /** REAL image decoder over the JDK's built-in `javax.imageio`
    * (PNG/JPEG/GIF/BMP readers ship with every JRE — no external
    * codec libraries required). Select it with
    * `spark.conf.set("graft.media.decoder",
    * "graft.ops.Multimodal$ImageIoDecoder")`. Payloads ImageIO cannot
    * parse (video containers, truncated bytes, the synthetic bench
    * corpus) fall back to the stub so the operators stay total; the
    * `format` field records what the magic bytes said either way.
    */
  class ImageIoDecoder extends MediaDecoder {
    private def readImage(payload: Array[Byte]): java.awt.image.BufferedImage =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }

    override def decodeMeta(mediaId: Long, payload: Array[Byte]): ImageMeta = {
      val img = readImage(payload)
      if (img == null) stubDecodeMeta(mediaId, payload)
      else ImageMeta(mediaId, img.getWidth, img.getHeight,
        channels = img.getColorModel.getNumComponents,
        format = sniffFormat(payload))
    }

    /** baseline visual feature from REAL pixels: an L1-normalized
      * luminance histogram over `dim` bins — deterministic and
      * model-free (a model forward pass would slot in here); falls
      * back to the stub pseudo-embedding for non-image payloads
      */
    override def feature(payload: Array[Byte], dim: Int): Array[Float] = {
      val img = readImage(payload)
      if (img == null) stubFeature(payload, dim)
      else {
        val hist = new Array[Float](dim)
        val w = img.getWidth
        val h = img.getHeight
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114) / 1000
            hist(math.min(dim - 1, lum * dim / 256)) += 1f
            x += 1
          }
          y += 1
        }
        val total = (w.toLong * h).toFloat
        var i = 0
        while (i < dim) { hist(i) /= total; i += 1 }
        hist
      }
    }
  }

  /** REAL audio + image decoder, still JDK-only: images via the
    * inherited javax.imageio path, audio via `javax.sound.sampled`
    * (WAV/AIFF/AU parsers ship with every JRE). `decodeAudio` reads
    * the container header — exact sample rate / channel count / frame
    * count — and `feature` computes a per-window RMS-energy vector
    * from the REAL PCM samples (the standard model-free audio
    * baseline; an encoder forward pass would slot in here). Payloads
    * neither codec family parses fall back to the stub so the
    * operators stay total.
    */
  final class JdkAvDecoder extends ImageIoDecoder {
    import javax.sound.sampled.{AudioFormat, AudioSystem}

    private def audioStream(payload: Array[Byte]) =
      try AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(
          new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => null }

    override def decodeAudio(mediaId: Long, payload: Array[Byte]): AudioMeta = {
      val in = audioStream(payload)
      if (in == null) stubDecodeAudio(mediaId, payload)
      else try {
        val f = in.getFormat
        val frames = in.getFrameLength
        val rate = math.round(f.getSampleRate)
        AudioMeta(mediaId, rate, f.getChannels, frames,
          duration_ms = if (rate > 0) frames * 1000L / rate else 0L,
          format = sniffFormat(payload))
      } finally in.close()
    }

    /** mono float samples in [-1, 1] (channels averaged), or null when
      * the payload is not parseable audio
      */
    private def readPcm(payload: Array[Byte]): Array[Float] = {
      val raw = audioStream(payload)
      if (raw == null) return null
      try {
        val src = raw.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          src.getChannels * 2, src.getSampleRate, false)
        val in = AudioSystem.getAudioInputStream(target, raw)
        val bytes = in.readAllBytes()
        val ch = target.getChannels
        val n = bytes.length / (2 * ch)
        val out = new Array[Float](n)
        var i = 0
        while (i < n) {
          var acc = 0f
          var c = 0
          while (c < ch) {
            val o = (i * ch + c) * 2
            val s = ((bytes(o) & 0xFF) | (bytes(o + 1) << 8)).toShort
            acc += s / 32768f
            c += 1
          }
          out(i) = acc / ch
          i += 1
        }
        out
      } catch { case scala.util.control.NonFatal(_) => null }
      finally raw.close()
    }

    override def feature(payload: Array[Byte], dim: Int): Array[Float] = {
      val pcm = readPcm(payload)
      if (pcm == null || pcm.isEmpty) super.feature(payload, dim)
      else {
        // RMS energy per window: dim equal slices of the sample stream
        val out = new Array[Float](dim)
        var w = 0
        while (w < dim) {
          val lo = (pcm.length.toLong * w / dim).toInt
          val hi = math.max(lo + 1, (pcm.length.toLong * (w + 1) / dim).toInt)
          var acc = 0.0
          var i = lo
          while (i < hi) { acc += pcm(i).toDouble * pcm(i); i += 1 }
          out(w) = math.sqrt(acc / (hi - lo)).toFloat
          w += 1
        }
        out
      }
    }
  }

  final case class VideoMeta(media_id: Long, duration_ms: Long,
      timescale: Int, tracks: Int, brand: String, format: String)

  /** REAL MP4 / ISO-BMFF box-structure parse (the container layout is
    * a public standard, ISO/IEC 14496-12): walks the top-level box
    * tree — each box is [uint32 size][4cc type], size 1 = 64-bit
    * largesize follows — reads the `ftyp` major brand, the
    * `moov`/`mvhd` movie header (timescale + duration, version 0 and
    * 1 layouts), and counts `trak` boxes. Header-level metadata only:
    * SAMPLE decode (pixels/audio inside `mdat`) needs codec libraries
    * the JDK doesn't ship and stays behind the pluggable decoder
    * seam. Returns None for payloads that aren't a well-formed box
    * tree with a movie header.
    */
  def parseMp4Meta(mediaId: Long, payload: Array[Byte]): Option[VideoMeta] = {
    def u32(o: Int): Long =
      if (o < 0 || o + 4 > payload.length) -1L
      else ((payload(o) & 0xFFL) << 24) | ((payload(o + 1) & 0xFFL) << 16) |
        ((payload(o + 2) & 0xFFL) << 8) | (payload(o + 3) & 0xFFL)
    def u64(o: Int): Long =
      if (o < 0 || o + 8 > payload.length) -1L else (u32(o) << 32) | u32(o + 4)
    def fourcc(o: Int): String =
      if (o + 4 > payload.length) ""
      else new String(payload, o, 4, "US-ASCII")
    // walk a box span, returning (type, payloadStart, boxEnd) triples
    def boxes(start: Int, end: Int): Iterator[(String, Int, Int)] =
      new Iterator[(String, Int, Int)] {
        private var off = start
        def hasNext: Boolean = off + 8 <= end
        def next(): (String, Int, Int) = {
          val size0 = u32(off)
          val typ = fourcc(off + 4)
          val (size, hdr) =
            if (size0 == 1L) (u64(off + 8), 16) else (size0, 8)
          val boxEnd =
            if (size == 0L) end // "to end of file" per spec
            else off + size
          if (size < hdr || boxEnd > end || boxEnd <= off) {
            off = end // malformed: stop the walk
            ("", 0, 0)
          } else {
            val res = (typ, off + hdr, math.min(boxEnd, end.toLong).toInt)
            off = math.min(boxEnd, end.toLong).toInt
            res
          }
        }
      }
    val top = boxes(0, payload.length).toList
    if (top.isEmpty || top.exists(_._1 == "")) return None
    val brand = top.find(_._1 == "ftyp").map(b => fourcc(b._2)).getOrElse("")
    top.find(_._1 == "moov").flatMap { case (_, ms, me) =>
      val kids = boxes(ms, me).toList
      val tracks = kids.count(_._1 == "trak")
      kids.find(_._1 == "mvhd").flatMap { case (_, ps, pe) =>
        if (ps >= pe) None
        else {
          val version = payload(ps) & 0xFF
          val (timescale, duration) =
            if (version == 1) (u32(ps + 20), u64(ps + 24))
            else (u32(ps + 12), u32(ps + 16))
          if (timescale <= 0 || duration < 0) None
          else Some(VideoMeta(mediaId,
            duration_ms = duration * 1000L / timescale,
            timescale = timescale.toInt, tracks = tracks, brand = brand,
            format = sniffFormat(payload)))
        }
      }
    }
  }

  /** conf key selecting the decoder implementation */
  val decoderConfKey = "graft.media.decoder"

  /** resolve the configured decoder (driver-side; the instance ships
    * in the task closure)
    */
  def decoderFor(spark: SparkSession): MediaDecoder = {
    val cls = spark.conf.get(decoderConfKey, classOf[StubDecoder].getName)
    Class.forName(cls).getDeclaredConstructor().newInstance()
      .asInstanceOf[MediaDecoder]
  }

  /** magic-byte sniffing is real (public file signatures) */
  def sniffFormat(payload: Array[Byte]): String = {
    if (payload == null || payload.length < 4) "unknown"
    else if (payload(0) == 0x89.toByte && payload(1) == 'P') "png"
    else if (payload(0) == 0xFF.toByte && payload(1) == 0xD8.toByte) "jpeg"
    else if (payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F')
      if (payload.length > 11 && payload(8) == 'W' && payload(9) == 'A' &&
        payload(10) == 'V' && payload(11) == 'E') "wav" else "riff"
    else if (payload.length > 8 && payload(4) == 'f' && payload(5) == 't' &&
      payload(6) == 'y' && payload(7) == 'p') "mp4"
    else "unknown"
  }

  // ---- STUB: deterministic fake decode (no codec libs in container) ----
  private def contentSeed(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    h
  }

  /** STUB decode: dimensions derived from the content hash. Real
    * implementation would parse the header / call the codec.
    */
  def stubDecodeMeta(media_id: Long, payload: Array[Byte]): ImageMeta = {
    val s = graft.sites.SyntheticWeb.mix64(contentSeed(payload))
    ImageMeta(media_id,
      width = 64 + ((s & 0xFFF) % 1024).toInt,
      height = 64 + (((s >>> 12) & 0xFFF) % 1024).toInt,
      channels = 3,
      format = sniffFormat(payload))
  }

  /** STUB audio decode: rate/channels/frames derived from the content
    * hash. Real implementation parses the container header
    * ([[JdkAvDecoder.decodeAudio]]).
    */
  def stubDecodeAudio(media_id: Long, payload: Array[Byte]): AudioMeta = {
    val s = graft.sites.SyntheticWeb.mix64(contentSeed(payload))
    val rate = Seq(8000, 16000, 22050, 44100)((s & 0x3).toInt)
    val frames = 256L + ((s >>> 2) & 0xFFFF)
    AudioMeta(media_id, rate, channels = 1 + ((s >>> 18) & 0x1).toInt,
      frames = frames, duration_ms = frames * 1000L / rate,
      format = sniffFormat(payload))
  }

  /** STUB video decode (payloads with no parseable box tree):
    * duration/tracks derived from the content hash, mirroring
    * [[stubDecodeMeta]]/[[stubDecodeAudio]].
    */
  def stubDecodeVideo(media_id: Long, payload: Array[Byte]): VideoMeta = {
    val s = graft.sites.SyntheticWeb.mix64(contentSeed(payload))
    val timescale = 600
    val durTicks = 600L + (s & 0xFFFF)
    VideoMeta(media_id, duration_ms = durTicks * 1000L / timescale,
      timescale = timescale, tracks = 1 + ((s >>> 16) & 0x1).toInt,
      brand = "", format = sniffFormat(payload))
  }

  /** STUB feature extraction: a deterministic pseudo-embedding of the
    * payload (dim floats seeded by content hash). Real implementation:
    * decoded pixels → model forward pass.
    */
  def stubFeature(payload: Array[Byte], dim: Int): Array[Float] = {
    val s0 = contentSeed(payload)
    Array.tabulate(dim) { d =>
      (graft.sites.SyntheticWeb.mix(s0, d.toLong, 0L).toFloat /
        Long.MaxValue.toFloat)
    }
  }

  /** Decode metadata for a media table — partition-parallel, batch
    * shape one-row-per-media; only (media_id, payload) are read, so
    * Parquet column pruning skips everything else. `decoder` overrides
    * the conf-selected codec (the driver queries pass
    * [[ImageIoDecoder]] explicitly so the REAL parse is verified).
    */
  def decodeMeta(media: Dataset[MediaRow],
      decoder: Option[MediaDecoder] = None): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    val dec = decoder.getOrElse(decoderFor(spark))
    media.mapPartitions(_.map(m => dec.decodeMeta(m.media_id, m.payload)))
  }

  /** Decode audio metadata — same partition-parallel batch shape as
    * [[decodeMeta]]. `decoder` overrides the conf-selected codec (the
    * driver queries pass [[JdkAvDecoder]] explicitly so the REAL
    * header parse is what gets verified).
    */
  def decodeAudioMeta(media: Dataset[MediaRow],
      decoder: Option[MediaDecoder] = None): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    val dec = decoder.getOrElse(decoderFor(spark))
    media.mapPartitions(_.map(m => dec.decodeAudio(m.media_id, m.payload)))
  }

  /** Decode video (container) metadata — [[parseMp4Meta]] box walk
    * for real ISO-BMFF payloads, stub fallback for everything else;
    * same partition-parallel batch shape as [[decodeMeta]].
    */
  def decodeVideoMeta(media: Dataset[MediaRow]): Dataset[VideoMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(m =>
      parseMp4Meta(m.media_id, m.payload)
        .getOrElse(stubDecodeVideo(m.media_id, m.payload))))
  }

  /** Frame sampling for video-ish payloads: every `strideMs`, up to
    * `maxFrames` frames, each with a feature vector. One input row
    * fans out to ≤ maxFrames rows — the UDTF (flatMap) batch shape.
    * Duration is REAL when the payload is a parseable ISO-BMFF box
    * tree (mvhd duration, [[parseMp4Meta]]); the payload-size
    * heuristic remains the fallback. Frame PIXEL decode would need
    * codec libs — features route through the pluggable decoder seam.
    */
  def sampleFrames(media: Dataset[MediaRow], strideMs: Long, maxFrames: Int,
      featureDim: Int = 16): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    val dec = decoderFor(spark)
    media.flatMap { m =>
      val durMs = parseMp4Meta(m.media_id, m.payload).map(_.duration_ms)
        .getOrElse(math.min(m.payload.length.toLong * 10L, strideMs * maxFrames))
      val n = math.min(maxFrames.toLong,
        math.max(1L, durMs / strideMs)).toInt
      (0 until n).iterator.map { i =>
        val tsMs = i * strideMs
        Frame(m.media_id, i, tsMs,
          dec.feature(m.payload ++ BigInt(tsMs).toByteArray, featureDim))
      }
    }
  }

  /** One synthetic but VALID 16-bit PCM RIFF/WAVE payload: sine tone
    * plus hash noise. Header parameters are simple arithmetic in the
    * row id — a foreign oracle recomputes the expected metadata while
    * the decoder parses the actual container bytes.
    */
  def syntheticWavBytes(i: Long, seed: Long): Array[Byte] = {
    val rate = Seq(8000, 16000, 22050, 44100)((i % 4).toInt)
    val channels = 1 + (i % 2).toInt
    val frames = (300L + (i * 37L) % 1000L).toInt
    val dataLen = frames * channels * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    val freq = 110.0 * (1 + (i % 8))
    var j = 0
    while (j < frames) {
      var c = 0
      while (c < channels) {
        val tone = 0.4 * StrictMath.sin(2.0 * math.Pi * freq * j / rate)
        val noise = (graft.sites.SyntheticWeb.mix(seed, i,
          (j.toLong << 1) | c) & 0xFFF).toInt / 40960.0 - 0.05
        buf.putShort(math.round((tone + noise) * 32767.0).toShort)
        c += 1
      }
      j += 1
    }
    buf.array()
  }

  /** One synthetic but VALID PNG payload, encoded by the JDK's own
    * PNG writer: dimensions are arithmetic in the row id, pixels a
    * deterministic hash pattern. The image-decode oracle recomputes
    * the dimensions from the id while [[ImageIoDecoder]] parses the
    * actual PNG container bytes — a mis-parse breaks the hash.
    */
  def syntheticPngBytes(i: Long, seed: Long): Array[Byte] = {
    val w = 8 + ((i * 13L) % 120L).toInt
    val h = 8 + ((i * 29L) % 90L).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = graft.sites.SyntheticWeb.mix(seed, i, (y.toLong << 20) | x)
        img.setRGB(x, y, (v & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** synthetic image corpus: real PNG containers (deterministic) */
  def syntheticImages(spark: SparkSession, n: Long,
      seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n).map(i => MediaRow(i, "png", syntheticPngBytes(i, seed)))
  }

  /** One synthetic but VALID ISO-BMFF (MP4) payload: a well-formed
    * box tree — `ftyp` (isom), `moov` holding a version-0 `mvhd`
    * movie header plus `trak` boxes, and an `mdat` of hash noise.
    * Header parameters are arithmetic in the row id — the video
    * oracle recomputes them while [[parseMp4Meta]] walks the actual
    * box bytes.
    */
  def syntheticMp4Bytes(i: Long, seed: Long): Array[Byte] = {
    val timescale = 600 * (1 + (i % 4).toInt)
    val durTicks = 1200L + (i * 53L) % 4800L
    val tracks = 1 + (i % 3).toInt
    val mdatLen = 64 + (graft.sites.SyntheticWeb.mix(seed, i, 0L) & 0xFF).toInt
    val buf = java.nio.ByteBuffer.allocate( // big-endian per the spec
      16 + (8 + 108 + 8 * tracks) + (8 + mdatLen))
    buf.putInt(16).put("ftypisom".getBytes("US-ASCII")).putInt(0x200)
    buf.putInt(8 + 108 + 8 * tracks).put("moov".getBytes("US-ASCII"))
    buf.putInt(108).put("mvhd".getBytes("US-ASCII"))
      .putInt(0)           // version 0 + flags
      .putInt(0).putInt(0) // creation/modification time
      .putInt(timescale).putInt(durTicks.toInt)
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
      .putLong(0L)         // reserved
      .putInt(0x10000).putInt(0).putInt(0) // unity matrix
      .putInt(0).putInt(0x10000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
    var p = 0
    while (p < 6) { buf.putInt(0); p += 1 } // pre_defined
    buf.putInt(tracks + 1) // next_track_id
    var t = 0
    while (t < tracks) {
      buf.putInt(8).put("trak".getBytes("US-ASCII")); t += 1
    }
    buf.putInt(8 + mdatLen).put("mdat".getBytes("US-ASCII"))
    var j = 0
    while (j < mdatLen) {
      buf.put(graft.sites.SyntheticWeb.mix(seed, i, j.toLong).toByte); j += 1
    }
    buf.array()
  }

  /** synthetic video corpus: real ISO-BMFF box trees (deterministic) */
  def syntheticVideo(spark: SparkSession, n: Long,
      seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n).map(i => MediaRow(i, "mp4", syntheticMp4Bytes(i, seed)))
  }

  /** synthetic audio corpus: real WAV containers (deterministic) */
  def syntheticAudio(spark: SparkSession, n: Long,
      seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n).map(i => MediaRow(i, "wav", syntheticWavBytes(i, seed)))
  }

  /** synthetic media corpus for tests/bench (deterministic) */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n).map { i =>
      val kind = Seq("png", "jpeg", "mp4")((i % 3).toInt)
      val magic: Array[Byte] = kind match {
        case "png" => Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
        case "jpeg" => Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)
        case _ => Array[Byte](0, 0, 0, 0x18, 'f'.toByte, 't'.toByte, 'y'.toByte, 'p'.toByte)
      }
      val body = Array.tabulate(((graft.sites.SyntheticWeb.mix(seed, i, 1L) & 0x3FF) + 64).toInt)(
        j => graft.sites.SyntheticWeb.mix(seed, i, j.toLong).toByte)
      MediaRow(i, kind, magic ++ body)
    }
  }
}
