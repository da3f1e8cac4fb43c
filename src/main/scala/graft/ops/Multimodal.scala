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
  * PNG/BMP/JPEG/GIF width/height/pixel-stats), AUDIO decode is real
  * (JDK-built-in javax.sound.sampled — WAV/AIFF/AU PCM sample rate,
  * channels, frames, duration, RMS), VIDEO container metadata is
  * real (pure-JVM MP4/ISO-BMFF and AVI/RIFF header parsing — width,
  * height, duration from `mvhd`/`tkhd`/`avih`; no codec needed), and
  * video FRAME decode is real for MJPEG AVIs ([[videoFrames]]: RIFF
  * demux + javax.imageio per-frame JPEG — q101's golden oracle).
  * Only frames in codecs this JVM lacks (H.264 etc.) fall back to the
  * documented deterministic byte-stat stub (`fakeDecode`); swap it for
  * a real codec (e.g. JNI ffmpeg) without touching any plumbing.
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

  /** Decoded audio metadata + signal statistics. Sample-value stats are in
    * raw PCM units (a 16-bit stream ranges ±32768). */
  case class AudioInfo(sample_rate: Double, channels: Int, n_frames: Long,
      duration_ms: Double, rms: Double)

  /** RMS sampling cap: at most this many PCM samples are read for the
    * signal stats, so a single multi-hour row cannot stall its partition
    * (duration/frames still come from the header and stay exact). */
  private val MaxRmsSamples = 1 << 20

  /** Decoded PCM payload: converted format, total frame count (from the
    * header — exact even when sampling caps the read), and the raw sample
    * bytes capped at [[MaxRmsSamples]]. */
  private case class Pcm(format: javax.sound.sampled.AudioFormat,
      nFrames: Long, data: Array[Byte])

  /** Shared decode plumbing for [[decodeAudio]] and [[audioEnergy]]:
    * open via javax.sound.sampled (WAV/AIFF/AU ship with the JDK),
    * convert non-PCM encodings (a-law/µ-law) to PCM_SIGNED, and read at
    * most `MaxRmsSamples` samples. Returns null for payloads no
    * registered reader accepts (text, images, video, corrupt data). */
  private def readPcm(bytes: Array[Byte]): Pcm = {
    if (bytes == null || bytes.isEmpty) return null
    try {
      val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      try {
        val pcmSigned = javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val ais =
          if (raw.getFormat.getEncoding == pcmSigned) raw
          else javax.sound.sampled.AudioSystem.getAudioInputStream(pcmSigned, raw)
        val f = ais.getFormat
        val bytesPerSample = f.getSampleSizeInBits / 8
        require(bytesPerSample >= 1 && bytesPerSample <= 4)
        val maxBytes = MaxRmsSamples * bytesPerSample
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var read = 0
        var n = ais.read(chunk)
        while (n > 0 && read < maxBytes) {
          buf.write(chunk, 0, math.min(n, maxBytes - read))
          read += n
          n = ais.read(chunk)
        }
        Pcm(f, ais.getFrameLength, buf.toByteArray)
      } finally raw.close()
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** Signed sample `i` of a PCM byte buffer, honoring the stream's
    * endianness, sign-extended from the format's sample width. */
  @inline private def pcmSample(p: Pcm, i: Int, bytesPerSample: Int): Long = {
    val off = i * bytesPerSample
    var v = 0L
    var b = 0
    while (b < bytesPerSample) {
      val idx = if (p.format.isBigEndian) off + b
        else off + bytesPerSample - 1 - b
      v = (v << 8) | (p.data(idx) & 0xffL)
      b += 1
    }
    val shift = 64 - p.format.getSampleSizeInBits
    (v << shift) >> shift
  }

  /** Real audio decode: bytes → (sample rate, channels, frame count,
    * duration, RMS); null for non-audio payloads. */
  private[graft] def decodeAudio(bytes: Array[Byte]): AudioInfo = {
    val p = readPcm(bytes)
    if (p == null) return null
    val f = p.format
    val durationMs =
      if (p.nFrames >= 0) p.nFrames * 1000.0 / f.getFrameRate else -1.0
    val bytesPerSample = f.getSampleSizeInBits / 8
    val nSamples = p.data.length / bytesPerSample
    var sumSq = 0.0
    var i = 0
    while (i < nSamples) {
      val s = pcmSample(p, i, bytesPerSample)
      sumSq += s.toDouble * s.toDouble
      i += 1
    }
    val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
    AudioInfo(f.getSampleRate.toDouble, f.getChannels, p.nFrames,
      durationMs, rms)
  }

  private val audioMetaUdf = udf(decodeAudio _)

  /** REAL audio feature extraction: per-window RMS energy over the decoded
    * PCM samples — a fixed-length `nWindows` vector (the energy-envelope
    * features a retrieval/quality pipeline bins on). Windows split the
    * sampled span evenly; null for non-audio payloads. Shares
    * [[readPcm]]'s conversion and work cap with [[decodeAudio]]. */
  private[graft] def audioEnergy(bytes: Array[Byte], nWindows: Int): Array[Double] = {
    if (nWindows <= 0) return null
    val p = readPcm(bytes)
    if (p == null) return null
    val bytesPerSample = p.format.getSampleSizeInBits / 8
    val nSamples = p.data.length / bytesPerSample
    if (nSamples == 0) return Array.fill(nWindows)(0.0)
    val sumSq = new Array[Double](nWindows)
    val cnt = new Array[Long](nWindows)
    var i = 0
    while (i < nSamples) {
      val s = pcmSample(p, i, bytesPerSample)
      val w = math.min(nWindows - 1, (i.toLong * nWindows / nSamples).toInt)
      sumSq(w) += s.toDouble * s.toDouble
      cnt(w) += 1
      i += 1
    }
    Array.tabulate(nWindows)(w =>
      if (cnt(w) == 0) 0.0 else math.sqrt(sumSq(w) / cnt(w)))
  }

  private val audioEnergyUdf = udf(audioEnergy _)

  /** Binary → nullable array<double> of `nWindows` per-window RMS
    * energies; null when the payload is not decodable audio.
    * Partition-parallel, no shuffle. */
  def audioFeatures(payload: Column, nWindows: Int): Column =
    audioEnergyUdf(payload, lit(nWindows))

  /** Binary → nullable struct(sample_rate, channels, n_frames, duration_ms,
    * rms); null when the payload is not decodable audio. Partition-
    * parallel, no shuffle. */
  def audioMeta(payload: Column): Column = audioMetaUdf(payload)

  /** Parsed video container metadata (header-only — no codec). */
  case class VideoInfo(container: String, width: Int, height: Int,
      duration_ms: Long)

  // ---- byte-order helpers for the container parsers (bounds are the
  // caller's responsibility; every entry point wraps in NonFatal → null)
  @inline private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  @inline private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  @inline private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  @inline private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** ISO-BMFF box walk over `bytes[start, end)`: (type, payloadStart,
    * payloadEnd) per box, honoring 64-bit `largesize` (size==1) and
    * to-end (size==0) encodings; stops at the first malformed size. */
  private def mp4Boxes(b: Array[Byte], start: Int, end: Int): Iterator[(String, Int, Int)] =
    new Iterator[(String, Int, Int)] {
      private var o = start
      def hasNext: Boolean = o + 8 <= end
      def next(): (String, Int, Int) = {
        val size = be32(b, o)
        val typ = fourcc(b, o + 4)
        val (ps, boxEnd) =
          if (size == 1 && o + 16 <= end) (o + 16, o + be64(b, o + 8))
          else if (size == 0) (o + 8, end.toLong)
          else (o + 8, o + size)
        if (boxEnd <= o || boxEnd > end) { o = end; (typ, ps, ps) } // malformed: stop
        else { o = boxEnd.toInt; (typ, ps, boxEnd.toInt) }
      }
    }

  /** MP4 (ISO base media) metadata: duration from `moov/mvhd`
    * (timescale + duration, version 0 and 1 layouts), width/height from
    * the largest `trak/tkhd` 16.16 fixed-point dimensions (audio tracks
    * carry 0×0). Returns null when no valid moov/mvhd is present. */
  private val Mp4TopLevelTypes =
    Set("ftyp", "styp", "moov", "mdat", "free", "skip", "wide", "pdin",
      "moof", "mfra", "meta", "uuid")

  private def parseMp4(b: Array[Byte]): VideoInfo = {
    // cheap magic gate: a junk payload must not get a full box walk
    if (!Mp4TopLevelTypes.contains(fourcc(b, 4))) return null
    val moov = mp4Boxes(b, 0, b.length).collectFirst {
      case ("moov", ps, pe) => (ps, pe)
    }.orNull
    if (moov == null) return null
    var durationMs = -1L
    var w = 0; var h = 0
    for ((typ, ps, pe) <- mp4Boxes(b, moov._1, moov._2)) typ match {
      case "mvhd" if pe - ps >= 20 =>
        val v = b(ps) & 0xff
        val (timescale, duration) =
          if (v == 1 && pe - ps >= 32) (be32(b, ps + 20), be64(b, ps + 24))
          else (be32(b, ps + 12), be32(b, ps + 16))
        if (timescale > 0) durationMs = duration * 1000L / timescale
      case "trak" =>
        for ((t2, p2, e2) <- mp4Boxes(b, ps, pe) if t2 == "tkhd") {
          val v = b(p2) & 0xff
          val dimOff = if (v == 1) 88 else 76 // layouts differ in 32- vs 64-bit times
          if (e2 - p2 >= dimOff + 8) {
            val tw = (be32(b, p2 + dimOff) >> 16).toInt
            val th = (be32(b, p2 + dimOff + 4) >> 16).toInt
            if (tw.toLong * th > w.toLong * h) { w = tw; h = th }
          }
        }
      case _ => ()
    }
    if (durationMs < 0) null else VideoInfo("mp4", w, h, durationMs)
  }

  /** AVI (RIFF) metadata: width/height/frame timing from the `hdrl`
    * LIST's `avih` main header. Returns null when the RIFF/AVI magic or
    * the header chunk is absent. */
  private def parseAvi(b: Array[Byte]): VideoInfo = {
    if (b.length < 24 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ")
      return null
    var o = 12
    while (o + 8 <= b.length) {
      val typ = fourcc(b, o)
      val size = le32(b, o + 4)
      val ps = o + 8
      val pe = math.min(ps + size, b.length.toLong).toInt
      if (typ == "LIST" && pe - ps >= 4 && fourcc(b, ps) == "hdrl") {
        var o2 = ps + 4
        while (o2 + 8 <= pe) {
          val t2 = fourcc(b, o2)
          val s2 = le32(b, o2 + 4)
          if (t2 == "avih" && s2 >= 40 && o2 + 8 + 40 <= pe) {
            val usPerFrame = le32(b, o2 + 8)
            val totalFrames = le32(b, o2 + 8 + 16)
            val w = le32(b, o2 + 8 + 32).toInt
            val h = le32(b, o2 + 8 + 36).toInt
            return VideoInfo("avi", w, h, usPerFrame * totalFrames / 1000L)
          }
          o2 += 8 + s2.toInt + (s2.toInt & 1) // chunks pad to even
        }
      }
      o = pe + (size.toInt & 1)
    }
    null
  }

  /** REAL video container metadata: bytes → (container, width, height,
    * duration_ms) from pure-JVM MP4/AVI header parsing — null for
    * payloads that are neither (text, images, audio, corrupt data).
    * Header-only work, so a multi-GB row costs a few hundred byte reads;
    * partition-parallel, no shuffle. Frame DECODE (pixels) still needs a
    * codec — see [[extractFeatures]]'s documented stub. */
  private[graft] def decodeVideoMeta(bytes: Array[Byte]): VideoInfo = {
    if (bytes == null || bytes.length < 16) return null
    try {
      val mp4 = parseMp4(bytes)
      if (mp4 != null) mp4 else parseAvi(bytes)
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  private val videoMetaUdf = udf(decodeVideoMeta _)

  /** Binary → nullable struct(container, width, height, duration_ms);
    * null when the payload is not a recognizable MP4/AVI container. */
  def videoMeta(payload: Column): Column = videoMetaUdf(payload)

  /** Golden-MP4 fixture builder (q53 + specs): a structurally valid
    * ISO-BMFF header (ftyp + moov(mvhd + trak(tkhd))) with known
    * timescale/duration and 16.16 fixed-point track dimensions — the
    * metadata parser reads the real box layout, so expected constants
    * are a true oracle. Lives here (not in the query file) because the
    * parser and its byte-layout twin belong together. */
  private[graft] def mp4Bytes(timescale: Int, duration: Int,
      width: Int, height: Int): Array[Byte] = {
    def w32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      w32(8L + payload.length) ++ typ.getBytes("ISO-8859-1") ++ payload
    val identityMatrix =
      w32(0x00010000L) ++ w32(0) ++ w32(0) ++ w32(0) ++
        w32(0x00010000L) ++ w32(0) ++ w32(0) ++ w32(0) ++ w32(0x40000000L)
    // mvhd v0: verflags, creation, modification, timescale, duration,
    // rate, volume+reserved, reserved, matrix, predefined, next_track
    val mvhd = w32(0) ++ w32(0) ++ w32(0) ++ w32(timescale) ++
      w32(duration) ++ w32(0x00010000L) ++ w32(0x01000000L) ++
      new Array[Byte](8) ++ identityMatrix ++ new Array[Byte](24) ++ w32(2)
    // tkhd v0: verflags/times/track/duration (24) + reserved (8) +
    // layer/group/volume/reserved (8) + matrix (36) + width/height as
    // 16.16 fixed (8) = 84 bytes; dims sit at payload offset 76
    def tkhd(w: Int, h: Int): Array[Byte] =
      new Array[Byte](40) ++ identityMatrix ++
        w32(w.toLong << 16) ++ w32(h.toLong << 16)
    val moov = box("moov", box("mvhd", mvhd) ++
      box("trak", box("tkhd", tkhd(width, height))) ++
      box("trak", box("tkhd", tkhd(0, 0)))) // audio track: 0×0 dims
    box("ftyp", "isom".getBytes("ISO-8859-1") ++ w32(512) ++
      "isomiso2".getBytes("ISO-8859-1")) ++ moov
  }

  /** Golden-AVI fixture builder (q53 + specs): RIFF('AVI ' LIST('hdrl'
    * avih)) with the real 56-byte main-header layout (little-endian). */
  private[graft] def aviBytes(usPerFrame: Int, totalFrames: Int,
      width: Int, height: Int): Array[Byte] = {
    def w32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val avih = w32(usPerFrame) ++ w32(0) ++ w32(0) ++ w32(0x10) ++
      w32(totalFrames) ++ w32(0) ++ w32(1) ++ w32(0) ++
      w32(width) ++ w32(height) ++ new Array[Byte](16)
    val hdrl = "hdrl".getBytes("ISO-8859-1") ++
      "avih".getBytes("ISO-8859-1") ++ w32(avih.length) ++ avih
    val riffBody = "AVI ".getBytes("ISO-8859-1") ++
      "LIST".getBytes("ISO-8859-1") ++ w32(hdrl.length) ++ hdrl
    "RIFF".getBytes("ISO-8859-1") ++ w32(riffBody.length) ++ riffBody
  }

  /** Demux an AVI's `movi` frame payloads — pure byte work, no codec:
    * iterate the RIFF chunks to the `movi` LIST, collect every `??dc` /
    * `??db` (compressed / uncompressed video) chunk, recursing into
    * `rec ` grouping LISTs. Empty for non-AVI payloads. Payload bytes
    * are sliced lazily per frame, so demuxing a multi-GB row to sample
    * 3 frames touches only those frames' byte ranges. */
  private[graft] def aviFrames(b: Array[Byte]): Array[Array[Byte]] = {
    if (b == null || b.length < 24 || fourcc(b, 0) != "RIFF" ||
        fourcc(b, 8) != "AVI ") return Array.empty
    val out = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def chunks(from: Int, to: Int): Unit = {
      var o = from
      while (o + 8 <= to) {
        val typ = fourcc(b, o)
        val size = le32(b, o + 4)
        val ps = o + 8
        val pe = math.min(ps + size, to.toLong).toInt
        if (typ == "LIST" && pe - ps >= 4) {
          val lt = fourcc(b, ps)
          if (lt == "movi" || lt == "rec ") chunks(ps + 4, pe)
        } else if (typ.length == 4 && typ(2) == 'd' &&
            (typ(3) == 'c' || typ(3) == 'b') && pe > ps) {
          out += java.util.Arrays.copyOfRange(b, ps, pe)
        }
        o = pe + (size.toInt & 1) // RIFF chunks pad to even
      }
    }
    chunks(12, b.length)
    out.toArray
  }

  /** One decoded video frame's shape + sampled pixel statistics. */
  case class FrameInfo(frame_idx: Int, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL video frame decode for MJPEG AVIs (each `movi` frame payload
    * is a standalone JPEG, which javax.imageio decodes — no external
    * codec): demux, stride-sample at most `maxFrames` frames evenly
    * across the stream, decode each through the same capped-stride pixel
    * probe as [[decodeImage]]. Empty for non-AVI payloads or AVIs whose
    * frames no registered reader accepts (a codec this JVM lacks falls
    * back to the documented [[extractFeatures]] byte-stat stub, never a
    * crash). `frame_idx` is the index in the ORIGINAL stream, so callers
    * see which frames the stride picked. */
  private[graft] def decodeVideoFrames(bytes: Array[Byte],
      maxFrames: Int): Array[FrameInfo] = {
    val frames = aviFrames(bytes)
    if (frames.isEmpty || maxFrames <= 0) return Array.empty
    val stride = math.max(1, frames.length / maxFrames)
    (0 until frames.length by stride).take(maxFrames).flatMap { i =>
      val info = decodeImage(frames(i))
      if (info == null) None
      else Some(FrameInfo(i, info.width, info.height,
        info.mean_r, info.mean_g, info.mean_b))
    }.toArray
  }

  private val videoFramesUdf = udf(decodeVideoFrames _)

  /** Binary → array<struct(frame_idx, width, height, mean_r, mean_g,
    * mean_b)> of decoded MJPEG-AVI frames (empty for other payloads).
    * Partition-parallel, no shuffle; per-row work is bounded by
    * `maxFrames` × the [[decodeImage]] probe cap. */
  def videoFrames(payload: Column, maxFrames: Int): Column =
    videoFramesUdf(payload, lit(maxFrames))

  /** Golden MJPEG-AVI fixture builder (q101 + specs): a real AVI
    * container (avih header + `movi` frame chunks) whose frames are
    * real ImageIO-encoded JPEGs of solid gray levels. Frame count and
    * dimensions are header-exact; gray LEVELS survive the lossy JPEG
    * round-trip only to within DC-quantization error, so oracles must
    * classify with wide margins, not compare exact means. */
  private[graft] def aviMjpegBytes(width: Int, height: Int,
      grays: Seq[Int], usPerFrame: Int = 40000): Array[Byte] = {
    def w32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def jpeg(gray: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val px = (gray << 16) | (gray << 8) | gray
      for (y <- 0 until height; x <- 0 until width) im.setRGB(x, y, px)
      val baos = new java.io.ByteArrayOutputStream()
      ImageIO.write(im, "jpg", baos)
      baos.toByteArray
    }
    def chunk(typ: String, payload: Array[Byte]): Array[Byte] =
      typ.getBytes("ISO-8859-1") ++ w32(payload.length) ++ payload ++
        (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    val avih = w32(usPerFrame) ++ w32(0) ++ w32(0) ++ w32(0x10) ++
      w32(grays.length) ++ w32(0) ++ w32(1) ++ w32(0) ++
      w32(width) ++ w32(height) ++ new Array[Byte](16)
    val hdrl = "hdrl".getBytes("ISO-8859-1") ++ chunk("avih", avih)
    val movi = "movi".getBytes("ISO-8859-1") ++
      grays.flatMap(g => chunk("00dc", jpeg(g))).toArray
    val riffBody = "AVI ".getBytes("ISO-8859-1") ++
      chunk("LIST", hdrl) ++ chunk("LIST", movi)
    "RIFF".getBytes("ISO-8859-1") ++ w32(riffBody.length) ++ riffBody
  }

  /** STUB decode (video frames): deterministic per-byte statistics
    * standing in for a real sample decode for containers whose frames
    * this JVM cannot decode (MJPEG-AVI frames ARE decoded for real —
    * [[videoFrames]]; container METADATA is real — [[videoMeta]]). Keeps
    * the exact UDF signature / batch shape a real decoder would have
    * (binary → fixed-length feature vector). */
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

  /** Frame sampling: REAL demuxed frame payloads for AVI containers
    * (every k-th `movi` chunk via [[aviFrames]] — each one a standalone
    * JPEG for MJPEG streams, feedable to [[imageMeta]]); for payloads
    * that are not an AVI the documented stub picks every k-th byte
    * window, keeping the binary-in/array<binary>-out shape a full demuxer
    * would have. Returns array<binary>. */
  private val frameSampleUdf = udf { (bytes: Array[Byte], k: Int) =>
    if (bytes == null || k <= 0) Array.empty[Array[Byte]]
    else {
      val real = aviFrames(bytes)
      if (real.nonEmpty) {
        val stride = math.max(1, real.length / k)
        (0 until real.length by stride).take(k).map(real).toArray
      } else
        bytes.grouped(math.max(1, bytes.length / math.max(k, 1))).take(k).toArray
    }
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
