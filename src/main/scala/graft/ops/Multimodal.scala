package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north star #3): image/audio/video travel as
  * opaque `binary` columns with a typed metadata struct. The Spark-side
  * plumbing — schema, batching, partition-parallel transforms, stable
  * output shape — is real and tested; the actual codec step is STUBBED
  * with a deterministic fake (this container has no image/audio libs).
  * Swap `fakeDecode` for a real codec (e.g. javax.imageio / JNI ffmpeg)
  * without touching any plumbing.
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

  /** STUB decode: deterministic per-byte statistics standing in for a real
    * pixel/sample decode. Keeps the exact UDF signature / batch shape a
    * real decoder would have (binary → fixed-length float feature vector).
    */
  private val fakeDecode: Array[Byte] => Array[Double] = { bytes =>
    // ??? real codec goes here; deterministic fake below
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
    * payload deterministically, preserving the binary-in/binary-out shape. */
  def resize(payload: Column, maxBytes: Int): Column =
    expr(s"substring(${payload.toString}, 1, $maxBytes)").cast(BinaryType)

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
