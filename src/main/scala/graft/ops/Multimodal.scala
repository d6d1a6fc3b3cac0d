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

  final case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long,
      feature: Array[Float])

  /** Codec contract. Implementations ship to executors inside task
    * closures, so they must be Serializable and constructible with a
    * no-arg constructor.
    */
  trait MediaDecoder extends Serializable {
    def decodeMeta(mediaId: Long, payload: Array[Byte]): ImageMeta
    def feature(payload: Array[Byte], dim: Int): Array[Float]
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
  final class ImageIoDecoder extends MediaDecoder {
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
    else if (payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F') "riff"
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
    * Parquet column pruning skips everything else.
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    val dec = decoderFor(spark)
    media.mapPartitions(_.map(m => dec.decodeMeta(m.media_id, m.payload)))
  }

  /** Frame sampling for video-ish payloads: every `strideMs`, up to
    * `maxFrames` frames, each with a stub feature vector. One input row
    * fans out to ≤ maxFrames rows — the UDTF (flatMap) batch shape.
    */
  def sampleFrames(media: Dataset[MediaRow], strideMs: Long, maxFrames: Int,
      featureDim: Int = 16): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    val dec = decoderFor(spark)
    media.flatMap { m =>
      // STUB duration: derived from payload size (real: container header)
      val durMs = math.min(m.payload.length.toLong * 10L, strideMs * maxFrames)
      val n = math.min(maxFrames.toLong, math.max(1L, durMs / strideMs)).toInt
      (0 until n).iterator.map { i =>
        val tsMs = i * strideMs
        Frame(m.media_id, i, tsMs,
          dec.feature(m.payload ++ BigInt(tsMs).toByteArray, featureDim))
      }
    }
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
