package graft.ops

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north star #3): image/audio/video travel as
  * opaque `binary` columns with a typed metadata struct. The Spark-side
  * plumbing — schema, batching, partition-parallel transforms, stable
  * output shape — is real and tested.
  *
  * Codec status: IMAGE decode is real (JDK-built-in javax.imageio —
  * PNG/BMP/JPEG/GIF width/height/pixel-stats, no external libs needed);
  * audio/video remain STUBBED with deterministic fakes (this container
  * ships no audio/video codecs). Swap `fakeDecode`/`sampleFrames` for a
  * real codec (e.g. JNI ffmpeg) without touching any plumbing.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = false)))

  /** Decoded image metadata + channel statistics. */
  case class ImageInfo(width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Real image decode (javax.imageio): bytes → (width, height, per-channel
    * means). Returns null for payloads no registered reader accepts (text,
    * audio, video, corrupt data) — callers get a nullable struct column.
    * Pixel stats sample at a stride that caps work at ~256×256 probes per
    * image so a single 100-megapixel row cannot stall its partition. */
  private[graft] def decodeImage(bytes: Array[Byte]): ImageInfo = {
    if (bytes == null || bytes.isEmpty) return null
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) null
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sx = math.max(1, w / 256)
        val sy = math.max(1, h / 256)
        var r = 0L; var g = 0L; var b = 0L; var n = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val px = img.getRGB(x, y)
            r += (px >> 16) & 0xff
            g += (px >> 8) & 0xff
            b += px & 0xff
            n += 1
            x += sx
          }
          y += sy
        }
        ImageInfo(w, h, r.toDouble / n, g.toDouble / n, b.toDouble / n)
      }
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  private val imageMetaUdf = udf(decodeImage _)

  /** Binary → nullable struct(width, height, mean_r, mean_g, mean_b);
    * null when the payload is not a decodable image. Partition-parallel,
    * no shuffle. */
  def imageMeta(payload: Column): Column = imageMetaUdf(payload)

  /** STUB decode (audio/video): deterministic per-byte statistics standing
    * in for a real sample decode. Keeps the exact UDF signature / batch
    * shape a real decoder would have (binary → fixed-length feature
    * vector). */
  private val fakeDecode: Array[Byte] => Array[Double] = { bytes =>
    if (bytes == null || bytes.isEmpty) Array.fill(4)(0.0)
    else {
      var sum = 0L; var min = 255; var max = 0
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sum += b; if (b < min) min = b; if (b > max) max = b
        i += 1
      }
      Array(bytes.length.toDouble, sum.toDouble / bytes.length,
        min.toDouble, max.toDouble)
    }
  }
  private val decodeUdf = udf(fakeDecode)

  /** Binary → feature vector column (partition-parallel, no shuffle). */
  def extractFeatures(payload: Column): Column = decodeUdf(payload)

  /** STUB resize: real impl would re-encode pixels; the fake truncates the
    * payload deterministically, preserving the binary-in/binary-out shape.
    * Column-API substring so ANY payload expression works (a string-
    * interpolated `payload.toString` breaks on non-trivial expressions). */
  def resize(payload: Column, maxBytes: Int): Column =
    substring(payload, 1, maxBytes)

  /** Frame sampling stub: pick every k-th byte window as a "frame". Real
    * impl: demux + decode keyframes. Returns array<binary>. */
  private val frameSampleUdf = udf { (bytes: Array[Byte], k: Int) =>
    if (bytes == null || k <= 0) Array.empty[Array[Byte]]
    else bytes.grouped(math.max(1, bytes.length / math.max(k, 1))).take(k).toArray
  }
  def sampleFrames(payload: Column, nFrames: Int): Column =
    frameSampleUdf(payload, lit(nFrames))

  /** Build a media table from documents (text bytes as stand-in payloads)
    * — realistic row sizes + metadata, used by tests and the q50 query. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))
}
