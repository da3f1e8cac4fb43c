package graft.queries

import graft.ops.Multimodal
import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import Queries._

/** MinHash-LSH dedup, multimodal plumbing, and the streaming batch-twin
  * queries. MinHash signatures are built from md5-derived integer shingle
  * hashes with affine re-hashes h_i(x) = (a_i·x + b_i) mod p — pure
  * integer math, so the DuckDB oracle is exact. At 100 TB the pattern is:
  * one projection pass to signatures (no shuffle), band-bucket join for
  * candidates (shuffle on band values only — tiny vs the corpus).
  */
object PipelineQueries {

  private val P = 2147483647L // 2^31 − 1
  private val NH = 8 // hashes per signature

  /** Golden-WAV builder shared by q52/q52b: `frames`×`channels` 16-bit
    * little-endian PCM samples from `sample(i)`, containerized via
    * javax.sound's own writer so the decode path reads a real file. */
  private def wavBytes(rate: Float, channels: Int, frames: Int,
      sample: Int => Short): Array[Byte] = {
    val data = new Array[Byte](frames * channels * 2)
    var i = 0
    while (i < frames * channels) {
      val v = sample(i)
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  // DuckDB twin of the native minhash_sig shingle hashing (oracles only;
  // the Spark side runs the codegen'd MinHashSig expression)
  private val shingleHashesSql =
    """LIST_TRANSFORM(
         LIST_DISTINCT(CASE WHEN LEN(toks) >= 3 THEN
           LIST_TRANSFORM(RANGE(1, LEN(toks) - 1),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           ELSE [] END),
         sh -> ('0x' || SUBSTRING(MD5(sh), 1, 8))::BIGINT)"""

  val qs: Seq[Q] = Seq(
    // ---- MinHash signatures (north star dedup #2): signature as a
    // comma-joined string column for schema-stable comparison
    Q("q44_minhash",
      (s, dir) => {
        graft.functions.TextHashFunctions.register(s)
        // array<long> → array<string> via Cast (codegen'd), NOT transform:
        // higher-order functions are CodegenFallback and would drag the
        // whole projection — including the native MinHashSig — out of
        // whole-stage codegen
        tbl(s, dir, "documents")
          .select(col("doc_id"),
            concat_ws(",", expr("minhash_sig(text)").cast("array<string>")).as("sig"))
          .orderBy("doc_id")
      },
      Some(s"""WITH h AS (
          SELECT doc_id, $shingleHashesSql AS hashes
          FROM (SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(text, ' +') AS toks FROM documents))
        SELECT doc_id,
          LIST_AGGREGATE(LIST_TRANSFORM(RANGE(0, $NH), i ->
            CAST(COALESCE(LIST_MIN(LIST_TRANSFORM(hashes,
              x -> (x * (2 * i + 1) + (i * i + 7)) % $P)),
              9223372036854775807) AS VARCHAR)), 'string_agg', ',') AS sig
        FROM h ORDER BY doc_id"""),
      bench = true),

    // ---- MinHash-LSH candidate pairs: 4 bands × 2 rows; pairs sharing
    // any band bucket (the scale path that avoids the O(n²) join)
    Q("q45_minhash_lsh_pairs",
      (s, dir) =>
        graft.ops.Dedup.minhashCandidates(
            tbl(s, dir, "documents").filter(col("doc_id") < 200),
            "doc_id", "text", bands = NH / 2, numHashes = NH)
          .select(col("id1").as("d1"), col("id2").as("d2"))
          .orderBy("d1", "d2"),
      Some(s"""WITH h AS (
          SELECT doc_id, $shingleHashesSql AS hashes
          FROM (SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(text, ' +') AS toks
                FROM documents WHERE doc_id < 200)),
        sig AS (
          SELECT doc_id, LIST_TRANSFORM(RANGE(0, $NH), i ->
            LIST_MIN(LIST_TRANSFORM(hashes,
              x -> (x * (2 * i + 1) + (i * i + 7)) % $P))) AS s
          FROM h),
        bands AS (
          SELECT doc_id, band,
            CAST(s[2 * band + 1] AS VARCHAR) || ':' || CAST(s[2 * band + 2] AS VARCHAR) AS bucket
          FROM sig, UNNEST(RANGE(0, ${NH / 2})) AS t(band))
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        ORDER BY d1, d2""")),

    // ---- MinHash similarity estimate (Dedup.minhashEstimate): the
    // Broder matching-component fraction over the q45 candidate pairs —
    // rank near-dups without re-reading text. est = matches / 8 is a
    // ratio of small ints (exact in both engines, no rounding needed).
    Q("q121_minhash_estimate",
      (s, dir) => {
        val docs = tbl(s, dir, "documents").filter(col("doc_id") < 200)
        val pairs = graft.ops.Dedup.minhashCandidates(
          docs, "doc_id", "text", bands = NH / 2, numHashes = NH)
        graft.ops.Dedup.minhashEstimate(docs, pairs, "doc_id", "text", NH)
          .select(col("id1").as("d1"), col("id2").as("d2"), col("est"))
          .orderBy("d1", "d2")
      },
      Some(s"""WITH h AS (
          SELECT doc_id, $shingleHashesSql AS hashes
          FROM (SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(text, ' +') AS toks
                FROM documents WHERE doc_id < 200)),
        sig AS (
          SELECT doc_id, LIST_TRANSFORM(RANGE(0, $NH), i ->
            COALESCE(LIST_MIN(LIST_TRANSFORM(hashes,
              x -> (x * (2 * i + 1) + (i * i + 7)) % $P)),
              9223372036854775807)) AS s
          FROM h),
        bands AS (
          SELECT doc_id, band,
            CAST(s[2 * band + 1] AS VARCHAR) || ':' || CAST(s[2 * band + 2] AS VARCHAR) AS bucket
          FROM sig, UNNEST(RANGE(0, ${NH / 2})) AS t(band)
          WHERE s[1] <> 9223372036854775807),
        pairs AS (
          SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
        SELECT d1, d2,
          CAST(LEN(LIST_FILTER(RANGE(1, $NH + 1),
            i -> sa.s[CAST(i AS INTEGER)] = sb.s[CAST(i AS INTEGER)])) AS DOUBLE) / $NH AS est
        FROM pairs
        JOIN sig sa ON sa.doc_id = d1
        JOIN sig sb ON sb.doc_id = d2
        ORDER BY d1, d2""")),

    // ---- incremental dedup (Dedup.minhashCandidatesAgainst): a NEW
    // batch (doc_id >= 250) matched against the existing REFERENCE
    // corpus (doc_id < 250) — the daily-ingest shape: asymmetric band
    // join, no id-ordering constraint, each side hashed once.
    Q("q88_incremental_dedup",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        graft.ops.Dedup.minhashCandidatesAgainst(
            docs.filter(col("doc_id") >= 250), docs.filter(col("doc_id") < 250),
            "doc_id", "text")
          .orderBy("new_id", "ref_id")
      },
      Some(s"""WITH h AS (
          SELECT doc_id, $shingleHashesSql AS hashes
          FROM (SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(text, ' +') AS toks
                FROM documents)),
        sig AS (
          SELECT doc_id, LIST_TRANSFORM(RANGE(0, $NH), i ->
            LIST_MIN(LIST_TRANSFORM(hashes,
              x -> (x * (2 * i + 1) + (i * i + 7)) % $P))) AS s
          FROM h),
        bands AS (
          SELECT doc_id, band,
            CAST(s[2 * band + 1] AS VARCHAR) || ':' || CAST(s[2 * band + 2] AS VARCHAR) AS bucket
          FROM sig, UNNEST(RANGE(0, ${NH / 2})) AS t(band))
        SELECT DISTINCT n.doc_id AS new_id, r.doc_id AS ref_id
        FROM bands n JOIN bands r
          ON n.band = r.band AND n.bucket = r.bucket
          AND n.doc_id >= 250 AND r.doc_id < 250
        ORDER BY new_id, ref_id""")),

    // ---- streaming MinHash filter, BATCH mode (Dedup.minhashCleanStream
    // is a plain transform, so the identical per-micro-batch plan runs
    // here over a batch frame): docs passing share NO band bucket with
    // the PERSISTED signature table — the complement of q88's candidate
    // set. The query exercises the real production path end-to-end:
    // writeBandedSignatures → read back → chained band-pruned anti-joins.
    // PipelineOpsSpec separately pins stream-mode ≡ this batch verdict.
    Q("q112_minhash_clean",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val sig = java.nio.file.Files.createTempDirectory("q112_bands").toString
        graft.ops.Dedup.writeBandedSignatures(
          docs.filter(col("doc_id") < 250), "doc_id", "text", sig,
          bands = NH / 2, numHashes = NH)
        graft.ops.Dedup.minhashCleanStream(
            docs.filter(col("doc_id") >= 250).select("doc_id", "text"),
            s.read.parquet(sig), "text", bands = NH / 2, numHashes = NH)
          .select("doc_id").orderBy("doc_id")
      },
      Some(s"""WITH h AS (
          SELECT doc_id, $shingleHashesSql AS hashes
          FROM (SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(text, ' +') AS toks
                FROM documents)),
        sig AS (
          SELECT doc_id, LIST_TRANSFORM(RANGE(0, $NH), i ->
            LIST_MIN(LIST_TRANSFORM(hashes,
              x -> (x * (2 * i + 1) + (i * i + 7)) % $P))) AS s
          FROM h),
        bands AS (
          SELECT doc_id, band,
            CAST(s[2 * band + 1] AS VARCHAR) || ':' || CAST(s[2 * band + 2] AS VARCHAR) AS bucket
          FROM sig, UNNEST(RANGE(0, ${NH / 2})) AS t(band)),
        hit AS (
          SELECT DISTINCT n.doc_id
          FROM bands n JOIN bands r
            ON n.band = r.band AND n.bucket = r.bucket
            AND n.doc_id >= 250 AND r.doc_id < 250)
        SELECT doc_id FROM documents
        WHERE doc_id >= 250 AND doc_id NOT IN (SELECT doc_id FROM hit)
        ORDER BY doc_id""")),

    // ---- multimodal plumbing: binary payloads + metadata; oracle checks
    // the schema-visible parts (byte length, md5 of payload). The real
    // image decoder (javax.imageio) runs over every payload and yields
    // NULL width for non-image bytes — the oracle asserts exactly that
    // (text payloads are not decodable images), proving the decode path
    // executes distributed without a Spark-side crutch.
    Q("q50_multimodal",
      (s, dir) => {
        val media = Multimodal.mediaFromDocuments(tbl(s, dir, "documents"))
        media
          .withColumn("feat", Multimodal.extractFeatures(col("payload")))
          .select(
            col("media_id"),
            col("meta.mime").as("mime"),
            length(col("payload")).as("n_bytes"),
            md5(col("payload")).as("payload_md5"),
            element_at(col("feat"), 1).as("feat_len"),
            Multimodal.imageMeta(col("payload")).getField("width").as("img_w"))
          .orderBy("media_id")
      },
      Some("""SELECT doc_id AS media_id, 'text/plain' AS mime,
          CAST(OCTET_LENGTH(ENCODE(text)) AS INTEGER) AS n_bytes,
          MD5(text) AS payload_md5,
          CAST(OCTET_LENGTH(ENCODE(text)) AS DOUBLE) AS feat_len,
          CAST(NULL AS INTEGER) AS img_w
        FROM documents ORDER BY media_id""")),

    // ---- real image decode, golden-oracle form: encode known PNG + BMP
    // images in-memory (16×8, left half red / right half green → exact
    // channel means), decode through the distributed imageMeta path, and
    // compare against the known constants. Decoded output is invariant to
    // encoder details, so the constants are a true oracle for the
    // javax.imageio codec path.
    Q("q51_image_decode",
      (s, dir) => {
        def img(): java.awt.image.BufferedImage = {
          val im = new java.awt.image.BufferedImage(16, 8,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          for (y <- 0 until 8; x <- 0 until 16)
            im.setRGB(x, y, if (x < 8) 0xff0000 else 0x00ff00)
          im
        }
        def bytes(fmt: String): Array[Byte] = {
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img(), fmt, baos)
          baos.toByteArray
        }
        import s.implicits._
        Seq((1L, bytes("png")), (2L, bytes("bmp")), (3L, "not an image".getBytes("UTF-8")))
          .toDF("media_id", "payload")
          .select(col("media_id"),
            Multimodal.imageMeta(col("payload")).as("m"))
          .select(col("media_id"),
            col("m.width").as("w"), col("m.height").as("h"),
            round(col("m.mean_r"), 2).as("mean_r"),
            round(col("m.mean_g"), 2).as("mean_g"),
            round(col("m.mean_b"), 2).as("mean_b"))
          .orderBy("media_id")
      },
      Some("""SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), CAST(16 AS INTEGER), CAST(8 AS INTEGER),
           CAST(127.5 AS DOUBLE), CAST(127.5 AS DOUBLE), CAST(0.0 AS DOUBLE)),
          (CAST(2 AS BIGINT), CAST(16 AS INTEGER), CAST(8 AS INTEGER),
           CAST(127.5 AS DOUBLE), CAST(127.5 AS DOUBLE), CAST(0.0 AS DOUBLE)),
          (CAST(3 AS BIGINT), CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))
        ) AS t(media_id, w, h, mean_r, mean_g, mean_b)
        ORDER BY media_id""")),

    // ---- real audio decode, golden-oracle form: synthesize WAV/PCM files
    // in-memory with exactly known signal content (a DC mono tone and a
    // ±square stereo tone — both have closed-form RMS in raw PCM units),
    // decode through the distributed audioMeta path (javax.sound.sampled),
    // and compare against the known constants. Header-derived fields
    // (rate, channels, frames, duration) are exact; the chosen signals
    // make RMS exact in double too.
    Q("q52_audio_decode",
      (s, dir) => {
        import s.implicits._
        Seq(
          (1L, wavBytes(8000f, 1, 8000, _ => 1000)),        // 1 s DC mono
          (2L, wavBytes(16000f, 2, 4000,                    // 0.25 s ± square
            i => if (i % 2 == 0) 2000 else -2000)),
          (3L, "not audio at all".getBytes("UTF-8")))
          .toDF("media_id", "payload")
          .select(col("media_id"), Multimodal.audioMeta(col("payload")).as("m"))
          .select(col("media_id"),
            col("m.sample_rate").as("rate_hz"),
            col("m.channels").as("channels"),
            col("m.n_frames").as("n_frames"),
            col("m.duration_ms").as("duration_ms"),
            round(col("m.rms"), 3).as("rms"))
          .orderBy("media_id")
      },
      Some("""SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), CAST(8000.0 AS DOUBLE), CAST(1 AS INTEGER),
           CAST(8000 AS BIGINT), CAST(1000.0 AS DOUBLE), CAST(1000.0 AS DOUBLE)),
          (CAST(2 AS BIGINT), CAST(16000.0 AS DOUBLE), CAST(2 AS INTEGER),
           CAST(4000 AS BIGINT), CAST(250.0 AS DOUBLE), CAST(2000.0 AS DOUBLE)),
          (CAST(3 AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS INTEGER),
           CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))
        ) AS t(media_id, rate_hz, channels, n_frames, duration_ms, rms)
        ORDER BY media_id""")),

    // ---- real video container-header metadata, golden-oracle form:
    // synthesize a structurally valid MP4 (timescale 1000, duration 2500
    // → 2500 ms; 320×240 video track beside a 0×0 audio track) and AVI
    // (40000 µs/frame × 250 frames → 10000 ms; 640×480), parse through
    // the distributed videoMeta path (pure-JVM mvhd/tkhd/avih byte
    // parsing — no codec), and compare against the known constants.
    // Non-video payloads (including real image bytes) must yield NULLs.
    Q("q53_video_meta",
      (s, dir) => {
        import s.implicits._
        Seq(
          (1L, Multimodal.mp4Bytes(
            timescale = 1000, duration = 2500, width = 320, height = 240)),
          (2L, Multimodal.aviBytes(
            usPerFrame = 40000, totalFrames = 250, width = 640, height = 480)),
          (3L, "definitely not a video container".getBytes("UTF-8")))
          .toDF("media_id", "payload")
          .select(col("media_id"), Multimodal.videoMeta(col("payload")).as("m"))
          .select(col("media_id"),
            col("m.container").as("container"),
            col("m.width").as("w"), col("m.height").as("h"),
            col("m.duration_ms").as("duration_ms"))
          .orderBy("media_id")
      },
      Some("""SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), 'mp4', CAST(320 AS INTEGER), CAST(240 AS INTEGER),
           CAST(2500 AS BIGINT)),
          (CAST(2 AS BIGINT), 'avi', CAST(640 AS INTEGER), CAST(480 AS INTEGER),
           CAST(10000 AS BIGINT)),
          (CAST(3 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER),
           CAST(NULL AS INTEGER), CAST(NULL AS BIGINT))
        ) AS t(media_id, container, w, h, duration_ms)
        ORDER BY media_id""")),

    // ---- real video FRAME decode, golden-oracle form: synthesize an
    // MJPEG AVI in-memory (real container + real ImageIO-encoded JPEG
    // frames at gray levels 40 / 128 / 216), demux + decode through the
    // distributed videoFrames path (pure-JVM AVI chunk walk +
    // javax.imageio JPEG — no external codec). Frame count and
    // dimensions are header-exact; gray levels survive the lossy JPEG
    // round-trip only to within DC-quantization error, so the oracle
    // compares a CLASS with ±85-wide bands (dark < 85 ≤ mid < 170 ≤
    // bright), not exact means. A second 5-frame AVI sampled at
    // maxFrames=2 pins the stride (frames 0 and 2 of 5). Non-video
    // payloads decode to zero frames.
    Q("q101_video_frames",
      (s, dir) => {
        import s.implicits._
        Seq(
          (1L, Multimodal.aviMjpegBytes(32, 16, Seq(40, 128, 216))),
          (2L, Multimodal.aviMjpegBytes(8, 8, Seq(40, 40, 216, 216, 216))),
          (3L, "definitely not a video".getBytes("UTF-8")))
          .toDF("media_id", "payload")
          .select(col("media_id"),
            explode_outer(Multimodal.videoFrames(col("payload"),
              maxFrames = 2)).as("f"))
          .select(col("media_id"),
            col("f.frame_idx").as("frame_idx"),
            col("f.width").as("w"), col("f.height").as("h"),
            when(col("f.frame_idx").isNull, lit(null).cast("string"))
              .when((col("f.mean_r") + col("f.mean_g") + col("f.mean_b")) / 3 < 85,
                lit("dark"))
              .when((col("f.mean_r") + col("f.mean_g") + col("f.mean_b")) / 3 < 170,
                lit("mid"))
              .otherwise(lit("bright")).as("luma_class"))
          .orderBy("media_id", "frame_idx")
      },
      Some("""SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), CAST(0 AS INTEGER), CAST(32 AS INTEGER),
           CAST(16 AS INTEGER), 'dark'),
          (CAST(1 AS BIGINT), CAST(1 AS INTEGER), CAST(32 AS INTEGER),
           CAST(16 AS INTEGER), 'mid'),
          (CAST(2 AS BIGINT), CAST(0 AS INTEGER), CAST(8 AS INTEGER),
           CAST(8 AS INTEGER), 'dark'),
          (CAST(2 AS BIGINT), CAST(2 AS INTEGER), CAST(8 AS INTEGER),
           CAST(8 AS INTEGER), 'bright'),
          (CAST(3 AS BIGINT), CAST(NULL AS INTEGER), CAST(NULL AS INTEGER),
           CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR))
        ) AS t(media_id, frame_idx, w, h, luma_class)
        ORDER BY media_id, frame_idx""")),

    // ---- end-to-end corpus curation (the workflow a training-data
    // pipeline actually runs, composed from the already-oracle-proven
    // operators): quality gate (length + type-token ratio) → language
    // gate (stopword heuristic) → exact dedup (Dedup.exact keeps the
    // min-doc_id copy) → MinHash-LSH near-dup candidates + exact Jaccard
    // verify (Dedup.minhashCandidates / jaccardVerify), dropping the
    // higher doc_id of each verified pair → per-source survivor stats.
    // At 100 TB every stage is a narrow projection, a key-only shuffle,
    // or a banded signature join — the corpus text is never pairwise-
    // joined or reshuffled.
    Q("q80_curation_pipeline",
      (s, dir) => {
        val toks = split(col("text"), " +")
        val nTok = size(toks)
        val ttr = size(array_distinct(toks)).cast("double") / nTok
        // arrays_overlap, not size(filter(toks, isin)) > 0: the two are
        // equivalent, but filter() is an interpreted higher-order function
        // that would drag this whole filter out of codegen (and interpret
        // the splits without subexpression elimination)
        val enHit = arrays_overlap(toks,
          array(Seq("the", "a", "and", "of", "fast", "slow").map(lit): _*))
        val kept = tbl(s, dir, "documents")
          .filter(nTok >= 5 && ttr >= 0.3 && enHit)
        // deduped fans out to THREE consumers (banding, the jaccard
        // shingle side, the final anti-join): truncate its lineage once
        // so each downstream stage serializes a one-node LogicalRDD
        // instead of re-embedding the scan+filter+window subtree —
        // without this the pipeline's stages broadcast 4-8 MiB task
        // binaries apiece — AND persist it: the truncated RDD is lazy,
        // so each consumer otherwise re-runs the full scan + quality
        // filter + md5 dedup join (at 100 TB: three corpus scans and
        // three full-text shuffles where one suffices; the r16 plan
        // audit measured the recompute as two of the row's hottest
        // single-stage jobs). Same session-cache contract as the
        // banded frames (Dedup object doc).
        val deduped = org.apache.spark.sql.graftbridge.PlanBridge.truncateLineage(
          graft.ops.Dedup.exact(kept, "doc_id", Seq("text")).drop("n_copies"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cands = graft.ops.Dedup.minhashCandidates(deduped, "doc_id", "text")
        val ver = graft.ops.Dedup.jaccardVerify(
          deduped, cands, "doc_id", "text", threshold = 0.5)
        // no distinct() on the drop set: a LEFT ANTI right side need not
        // be unique (the join's hash build dedups internally) and the
        // distinct cost a full exchange + two aggregates per run
        val fin = deduped.join(
          ver.select(col("id2").as("doc_id")), Seq("doc_id"), "left_anti")
        fin.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(size(split(col("text"), " +"))).as("total_tokens"))
          .orderBy("source")
      },
      Some(s"""WITH toksed AS (
          SELECT doc_id, text, source, REGEXP_SPLIT_TO_ARRAY(text, ' +') AS toks
          FROM documents),
        kept AS (
          SELECT * FROM toksed
          WHERE LEN(toks) >= 5
            AND CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks) >= 0.3
            AND LEN(LIST_FILTER(toks,
              t -> t IN ('the', 'a', 'and', 'of', 'fast', 'slow'))) > 0),
        keepers AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY MD5(text)),
        dd AS (SELECT k.* FROM kept k JOIN keepers USING (doc_id)),
        h AS (SELECT doc_id, $shingleHashesSql AS hashes FROM dd),
        sig AS (
          SELECT doc_id, LIST_TRANSFORM(RANGE(0, $NH), i ->
            LIST_MIN(LIST_TRANSFORM(hashes,
              x -> (x * (2 * i + 1) + (i * i + 7)) % $P))) AS s
          FROM h),
        bands AS (
          SELECT doc_id, band,
            CAST(s[2 * band + 1] AS VARCHAR) || ':' || CAST(s[2 * band + 2] AS VARCHAR) AS bucket
          FROM sig, UNNEST(RANGE(0, ${NH / 2})) AS t(band)),
        cand AS (
          SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        sh AS (
          SELECT doc_id,
            LIST_DISTINCT(CASE WHEN LEN(toks) >= 3 THEN
              LIST_TRANSFORM(RANGE(1, LEN(toks) - 1),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              ELSE [] END) AS sh
          FROM dd),
        ver AS (
          SELECT d1, d2 FROM cand
          JOIN sh s1 ON cand.d1 = s1.doc_id
          JOIN sh s2 ON cand.d2 = s2.doc_id
          WHERE CAST(LEN(LIST_INTERSECT(s1.sh, s2.sh)) AS DOUBLE) /
            LEN(LIST_DISTINCT(s1.sh || s2.sh)) >= 0.5),
        fin AS (SELECT * FROM dd WHERE doc_id NOT IN (SELECT d2 FROM ver))
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(LEN(toks)) AS BIGINT) AS total_tokens
        FROM fin GROUP BY source ORDER BY source"""),
      bench = true),

    // ---- deterministic hash sampling (Sampling.hashSample): Bernoulli
    // keyed on doc_id via an md5-derived u32 coin — reruns, backfills,
    // and the oracle engine pick the SAME rows (df.sample() could never
    // be oracle-checked: its selection depends on Spark's partition-
    // seeded RNG). rate 0.25 → threshold round(0.25·2^32) = 1073741824.
    Q("q90_hash_sample",
      (s, dir) =>
        graft.ops.Sampling.hashSample(
            tbl(s, dir, "documents"), col("doc_id"), rate = 0.25, seed = 7L)
          .select(col("doc_id"), col("source"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, source FROM documents
        WHERE ('0x' || SUBSTRING(MD5('7:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          < 1073741824
        ORDER BY doc_id""")),

    // ---- per-source mixing (Sampling.stratifiedHashSample): the source-
    // reweighting step of a corpus mix — keep all of src0, half of src1,
    // 10% of everything else, decided by the same keyed coin per doc.
    Q("q90b_weighted_mix",
      (s, dir) =>
        graft.ops.Sampling.stratifiedHashSample(
            tbl(s, dir, "documents"), col("source"), col("doc_id"),
            rates = Map("src0" -> 1.0, "src1" -> 0.5),
            defaultRate = 0.1, seed = 7L)
          .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
          .orderBy("source"),
      Some("""SELECT source, COUNT(*) AS n_docs FROM documents
        WHERE ('0x' || SUBSTRING(MD5('7:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          < CASE source WHEN 'src0' THEN 4294967296
                        WHEN 'src1' THEN 2147483648
                        ELSE 429496730 END
        GROUP BY source ORDER BY source""")),

    // ---- per-source TOKEN-budget sampling (Sampling.tokenBudgetCap):
    // the "give source s exactly B training tokens" mixing step — docs
    // taken in keyed-hash order until the budget is spent (src0 gets
    // 1000 tokens, src1 zero, everyone else 400). Spark runs the binned
    // two-phase selection (bin-offset join + per-(stratum, bin) fine
    // window); the oracle replays the naive running-sum definition the
    // binned form is row-for-row equal to. binBits=4 at this scale so
    // bins genuinely split each source's docs.
    Q("q105_token_budget",
      (s, dir) => {
        val d = tbl(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " +")).as("n_tokens"))
        graft.ops.Sampling.tokenBudgetCap(d, col("source"), col("doc_id"),
            col("n_tokens"), budgets = Map("src0" -> 1000L, "src1" -> 0L),
            defaultBudget = 400L, seed = 7L, binBits = 4)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("toks_kept"))
          .orderBy("source")
      },
      Some("""WITH t AS (
          SELECT doc_id, source,
            LEN(REGEXP_SPLIT_TO_ARRAY(text, ' +')) AS n_tokens,
            ('0x' || SUBSTRING(MD5('7:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
          FROM documents),
        c AS (
          SELECT *, COALESCE(SUM(n_tokens) OVER (
            PARTITION BY source ORDER BY h, CAST(doc_id AS VARCHAR)
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
          FROM t),
        kept AS (
          SELECT * FROM c WHERE cb < CASE source WHEN 'src0' THEN 1000
                                                 WHEN 'src1' THEN 0
                                                 ELSE 400 END)
        SELECT source, COUNT(*) AS n_docs,
          CAST(SUM(n_tokens) AS BIGINT) AS toks_kept
        FROM kept GROUP BY source ORDER BY source"""),
      bench = true),

    // ---- concat-and-chop sequence packing (Sampling.packSequences):
    // each doc's token span in its shard's concatenated stream, and the
    // ctx-window ids that span covers. Layout is a pure function of
    // (seed, doc_id) — the oracle reproduces the exact shard order with
    // the same md5 coin. At 100 TB: one hash shuffle into shards; the
    // only serial state is a per-shard running sum.
    Q("q91_pack_sequences",
      (s, dir) =>
        graft.ops.Sampling.packSequences(
            tbl(s, dir, "documents")
              .select(col("doc_id"), size(split(col("text"), " +")).as("n_tok")),
            "doc_id", col("n_tok"), ctxLen = 512, shards = 8, seed = 7L)
          .select(col("doc_id"), col("shard"),
            col("start_off").cast("long").as("start_off"),
            col("end_off").cast("long").as("end_off"),
            col("first_pack").cast("long").as("first_pack"),
            col("last_pack").cast("long").as("last_pack"))
          .orderBy("doc_id"),
      Some("""WITH t AS (
          SELECT doc_id,
            LEN(REGEXP_SPLIT_TO_ARRAY(text, ' +')) AS n_tok,
            ('0x' || SUBSTRING(MD5('7:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
          FROM documents),
        c AS (
          SELECT doc_id, CAST(h % 8 AS INTEGER) AS shard, n_tok,
            CAST(SUM(n_tok) OVER (PARTITION BY h % 8 ORDER BY h, doc_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_off
          FROM t)
        SELECT doc_id, shard,
          end_off - n_tok AS start_off, end_off,
          (end_off - n_tok) // 512 AS first_pack,
          (end_off - 1) // 512 AS last_pack
        FROM c ORDER BY doc_id""")),

    // ---- model-based quality filter: score docs with a FIXED logistic
    // model over [1, n_tokens, type_token_ratio] (the fixed-β discipline
    // of q20/q21 — a solver-produced β is engine-specific) and keep docs
    // the model accepts. The margin x·β is reported instead of the
    // probability: sign(margin) = (p > 0.5) exactly, with no exp() libm
    // variance; the native codegen'd ArrayDot folds left like the
    // oracle's LIST_DOT_PRODUCT, and the margin is rounded BEFORE the
    // keep test so a boundary ulp cannot flip membership.
    Q("q92_model_filter",
      (s, dir) => {
        val toks = split(col("text"), " +")
        val feats = tbl(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            array(lit(1.0), size(toks).cast("double"),
              size(array_distinct(toks)).cast("double") / size(toks))
              .as("x"))
        val beta = array(lit(-8.0), lit(0.1), lit(5.0))
        feats
          .select(col("doc_id"), col("source"),
            round(graft.functions.ArrayMath.dot(col("x"), beta), 6).as("margin"))
          .filter(col("margin") > 0)
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, source, margin FROM (
          SELECT doc_id, source,
            ROUND(LIST_DOT_PRODUCT(
              [1.0, CAST(LEN(toks) AS DOUBLE),
               CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks)],
              [-8.0, 0.1, 5.0]), 6) AS margin
          FROM (SELECT doc_id, source,
                  REGEXP_SPLIT_TO_ARRAY(text, ' +') AS toks FROM documents))
        WHERE margin > 0 ORDER BY doc_id""")),

    // ---- exact incremental match (Dedup.exactMatchesAgainst): new-batch
    // docs whose BLOCKING KEY (lang, n_chars — the record-linkage
    // coarse-key pattern) matches any reference doc; NULLs match NULLs
    // per the exact-dedup key encoding. Left-semi on md5 keys only; at
    // scale Spark's runtime bloom filter pushes the reference keys into
    // the new batch's scan (plan-gated in PlanSpec).
    Q("q97_exact_incremental",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        graft.ops.Dedup.exactMatchesAgainst(
            docs.filter(col("doc_id") >= 100),
            docs.filter(col("doc_id") < 100),
            "doc_id", Seq("lang", "n_chars"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id FROM documents a
        WHERE doc_id >= 100 AND EXISTS (
          SELECT 1 FROM documents b WHERE b.doc_id < 100
            AND b.lang IS NOT DISTINCT FROM a.lang
            AND b.n_chars IS NOT DISTINCT FROM a.n_chars)
        ORDER BY doc_id""")),

    // ---- streaming exact filter, BATCH mode (Dedup.exactCleanStream is
    // a plain transform): the complement of q97 — docs whose blocking
    // key matches NO reference row pass through with all their columns.
    Q("q111_exact_clean",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        graft.ops.Dedup.exactCleanStream(
            docs.filter(col("doc_id") >= 100)
              .select("doc_id", "lang", "n_chars"),
            docs.filter(col("doc_id") < 100), Seq("lang", "n_chars"))
          .select("doc_id").orderBy("doc_id")
      },
      Some("""SELECT doc_id FROM documents a
        WHERE doc_id >= 100 AND NOT EXISTS (
          SELECT 1 FROM documents b WHERE b.doc_id < 100
            AND b.lang IS NOT DISTINCT FROM a.lang
            AND b.n_chars IS NOT DISTINCT FROM a.n_chars)
        ORDER BY doc_id""")),

    // ---- real audio FEATURE EXTRACTION, golden-oracle form: a WAV whose
    // first half is DC +1000 and second half DC +3000 has a closed-form
    // 2-window energy envelope [1000, 3000]; the ± square has constant
    // envelope 2000 in every window. Non-audio → null vector.
    Q("q52b_audio_features",
      (s, dir) => {
        import s.implicits._
        Seq(
          (1L, wavBytes(8000f, 1, 4000, i => if (i < 2000) 1000 else 3000)),
          (2L, wavBytes(8000f, 1, 4000, i => if (i % 2 == 0) 2000 else -2000)),
          (3L, "not audio".getBytes("UTF-8")))
          .toDF("media_id", "payload")
          .select(col("media_id"),
            Multimodal.audioFeatures(col("payload"), 2).as("e"))
          .select(col("media_id"),
            round(element_at(col("e"), 1), 3).as("e1"),
            round(element_at(col("e"), 2), 3).as("e2"))
          .orderBy("media_id")
      },
      Some("""SELECT * FROM (VALUES
          (CAST(1 AS BIGINT), CAST(1000.0 AS DOUBLE), CAST(3000.0 AS DOUBLE)),
          (CAST(2 AS BIGINT), CAST(2000.0 AS DOUBLE), CAST(2000.0 AS DOUBLE)),
          (CAST(3 AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))
        ) AS t(media_id, e1, e2)
        ORDER BY media_id""")),

    // ---- streaming batch-twin: 5-minute tumbling windows over events
    Q("q60_tumbling_window",
      (s, dir) =>
        EventStream.tumblingCounts(eventsTbl(s, dir))
          .select(unix_micros(col("win_start")).as("win_us"),
            col("event_type"), col("n"), col("total"))
          .orderBy("win_us", "event_type"),
      Some(s"""SELECT EPOCH_US(TIME_BUCKET(INTERVAL 5 MINUTES, ts)) AS win_us,
          event_type, COUNT(*) AS n,
          ${dsumSql("value")} AS total
        FROM events GROUP BY 1, 2 ORDER BY win_us, event_type"""),
      bench = true),

    // ---- sliding windows (batch twin of the watermarked streaming form):
    // 10-minute windows sliding every 5 — each event lands in exactly 2
    // windows, both epoch-aligned on the slide like DuckDB's TIME_BUCKET,
    // so the twin enumerates k ∈ {0,1} shifted buckets per event.
    Q("q60b_sliding_window",
      (s, dir) =>
        EventStream.slidingCounts(eventsTbl(s, dir))
          .select(unix_micros(col("win_start")).as("win_us"),
            col("event_type"), col("n"), col("total"))
          .orderBy("win_us", "event_type"),
      Some(s"""SELECT
          EPOCH_US(TIME_BUCKET(INTERVAL 5 MINUTES, ts) - k * INTERVAL 5 MINUTES) AS win_us,
          event_type, COUNT(*) AS n, ${dsumSql("value")} AS total
        FROM events, UNNEST([0, 1]) AS t(k)
        GROUP BY 1, 2 ORDER BY win_us, event_type""")),

    // ---- interval join (batch twin of the watermarked stream-stream
    // join): click→view attribution — each click matched to same-user
    // views within the prior 10 minutes; per-user counts + exact integer
    // lag bounds. At scale both streams shuffle on user_id once and the
    // watermark bounds the join state.
    Q("q81_interval_join",
      (s, dir) => {
        val ev = eventsTbl(s, dir).filter(col("user_id") <= 100)
        val clicks = ev.filter(col("event_type") === "click")
        val views = ev.filter(col("event_type") === "view")
        EventStream.intervalJoinBatch(clicks, views, windowMinutes = 10)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_attributed"),
            min(unix_micros(col("l_ts")) - unix_micros(col("r_ts"))).as("min_lag_us"),
            max(unix_micros(col("l_ts")) - unix_micros(col("r_ts"))).as("max_lag_us"))
          .orderBy("user_id")
      },
      Some("""SELECT c.user_id AS user_id, COUNT(*) AS n_attributed,
          MIN(EPOCH_US(c.ts) - EPOCH_US(v.ts)) AS min_lag_us,
          MAX(EPOCH_US(c.ts) - EPOCH_US(v.ts)) AS max_lag_us
        FROM (SELECT * FROM events WHERE event_type = 'click' AND user_id <= 100) c
        JOIN (SELECT * FROM events WHERE event_type = 'view' AND user_id <= 100) v
          ON c.user_id = v.user_id AND v.ts <= c.ts
            AND c.ts < v.ts + INTERVAL 10 MINUTES
        GROUP BY c.user_id ORDER BY c.user_id""")),

    // ---- as-of join: each event ↔ the user's most recent order at or
    // before the event time (composed union+window operator; oracle is
    // DuckDB's native ASOF JOIN). Right side deduped per (key, time) for
    // deterministic tie behavior.
    Q("q62_asof_join",
      (s, dir) => {
        val ev = eventsTbl(s, dir).filter(col("user_id") <= 100)
          .select(col("event_id"), col("user_id"), col("ts"))
        val ord = tbl(s, dir, "orders")
          .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
          .groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max(col("o_orderkey")).as("o_orderkey"))
        graft.ops.AsOfJoin.asOf(ev, ord, "user_id", "o_custkey", "ts", "o_orderdate",
            Seq("o_orderkey", "o_orderdate"))
          .select(col("event_id"), col("user_id"), col("o_orderkey"),
            unix_micros(col("o_orderdate")).as("ord_us"))
          .orderBy("event_id")
      },
      Some("""WITH ord AS (
          SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
          FROM orders GROUP BY 1, 2)
        SELECT event_id, user_id, o_orderkey, EPOCH_US(o_orderdate) AS ord_us
        FROM (SELECT event_id, user_id, ts FROM events WHERE user_id <= 100) e
        ASOF JOIN ord ON e.user_id = ord.o_custkey AND e.ts >= ord.o_orderdate
        ORDER BY event_id""")),

    // ---- range join: events.value into derived [lo, hi) buckets — the
    // small range table broadcasts, so the fact side is one scan with a
    // conditional broadcast join (the scale shape for interval joins;
    // for range-vs-range at scale, bucket both sides first)
    Q("q63_range_join",
      (s, dir) => {
        val ranges = tbl(s, dir, "nation")
          .select(col("n_nationkey").as("bkt"),
            (col("n_nationkey") * 4.0).as("lo"),
            (col("n_nationkey") * 4.0 + 4.0).as("hi"))
        val ev = eventsTbl(s, dir).select(col("event_id"), col("value"))
        ev.join(broadcast(ranges),
            col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy(col("bkt"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
          .orderBy("bkt")
      },
      Some(s"""SELECT bkt, COUNT(*) AS n, ${dsumSql("value")} AS total
        FROM events JOIN (
          SELECT n_nationkey AS bkt, n_nationkey * 4.0 AS lo,
                 n_nationkey * 4.0 + 4.0 AS hi FROM nation) r
          ON value >= lo AND value < hi
        GROUP BY bkt ORDER BY bkt""")),

    // ---- range-vs-range overlap join (RangeJoin.overlapBucketed): the
    // scale path q63's broadcast shape can't cover — both interval sides
    // bucket on ⌊bound/width⌋, the exact overlap predicate runs within
    // buckets only, and each pair is emitted in exactly ONE bucket (first-
    // overlap guard) so no dedup shuffle follows. Oracle: the plain theta
    // join — identical double comparisons on both engines.
    Q("q67_range_overlap",
      (s, dir) => {
        val ev = eventsTbl(s, dir).select(col("event_id"), col("value"),
          col("value").as("lo"), (col("value") + lit(5.0)).as("hi"))
        val ranges = tbl(s, dir, "nation").select(col("n_nationkey").as("bkt"),
          (col("n_nationkey") * lit(12.0)).as("rlo"),
          (col("n_nationkey") * lit(12.0) + lit(20.0)).as("rhi"))
        graft.ops.RangeJoin.overlapBucketed(ev, ranges, "lo", "hi", "rlo", "rhi",
            bucketWidth = 16.0)
          .groupBy(col("r_bkt"))
          .agg(count(lit(1)).as("n"), dsum(col("l_value")).as("total"))
          .select(col("r_bkt").as("bkt"), col("n"), col("total"))
          .orderBy("bkt")
      },
      Some(s"""SELECT r.bkt, COUNT(*) AS n, ${dsumSql("e.value")} AS total
        FROM events e JOIN (
          SELECT n_nationkey AS bkt, n_nationkey * 12.0 AS rlo,
                 n_nationkey * 12.0 + 20.0 AS rhi FROM nation) r
          ON e.value < r.rhi AND r.rlo < e.value + 5.0
        GROUP BY r.bkt ORDER BY bkt""")),

    // ---- salted two-phase aggregation (Skew.saltedAgg): hot-key-safe
    // group-agg whose result is EXACTLY the plain groupBy (the oracle) —
    // sums stay in decimal through both phases, so the two-step
    // partial/final composition is order-independent and cross-engine
    // exact; cast to double only at the end (dsum contract)
    Q("q64_salted_agg",
      (s, dir) =>
        graft.ops.Skew.saltedAgg(tbl(s, dir, "lineitem"),
            col("l_returnflag"), col("l_quantity").cast("decimal(30,4)"), nSalts = 16)
          .select(col("key"), col("n"), col("total").cast("double").as("total"))
          .orderBy("key"),
      Some("""SELECT l_returnflag AS key, COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS total
        FROM lineitem GROUP BY 1 ORDER BY key""")),

    // ---- salted join (Skew.saltedJoin): skewed-left vs replicated-right
    // join whose result is EXACTLY the plain equi-join (the oracle) —
    // the right side replicates once per salt, the left salts uniformly,
    // so the hot key's rows spread over nSalts reducers. Aggregates stay
    // decimal-exact through the dsum contract.
    Q("q71_salted_join",
      (s, dir) => {
        val li = tbl(s, dir, "lineitem")
        val ord = tbl(s, dir, "orders").select("o_orderkey", "o_orderstatus")
        graft.ops.Skew.saltedJoin(li, ord, "l_orderkey", "o_orderkey", nSalts = 8)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("total_qty"))
          .orderBy("o_orderstatus")
      },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n,
          ${dsumSql("l_quantity")} AS total_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ---- sessionization (gap-and-island batch twin of the stateful path)
    Q("q61_sessionize",
      (s, dir) =>
        EventStream.sessionizeBatch(eventsTbl(s, dir), gapMinutes = 30)
          .filter(col("user_id") <= 50)
          .orderBy("user_id", "session_seq"),
      Some("""WITH g AS (
          SELECT user_id, event_id, EPOCH_US(ts) AS us,
            CASE WHEN LAG(EPOCH_US(ts), 1) OVER w IS NULL
              OR EPOCH_US(ts) - LAG(EPOCH_US(ts), 1) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        s AS (
          SELECT user_id, us,
            CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
          FROM g)
        SELECT user_id, session_seq, COUNT(*) AS n_events,
          MIN(us) AS start_us, MAX(us) AS end_us
        FROM s WHERE user_id <= 50
        GROUP BY user_id, session_seq ORDER BY user_id, session_seq""")),

    // ---- URL canonicalization (ops.Urls, the C4/RefinedWeb crawl-
    // hygiene step): fixture-derived URLs exercise every normalization
    // path — mixed-case scheme/host, default :443 port, a leading
    // utm_ param, a trailing gclid, an intermittent fragment — plus
    // host and registered-domain extraction. The whole chain is
    // trim/lower/regex (Java∩RE2 subset), replayed by the oracle with
    // RE2 \1 backrefs and 'g' flags where the engines' defaults differ.
    Q("q127_url_normalize",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val url = concat(
          lit("HTTPS://WWW."), upper(col("source")), lit(".Example.COM:443/Docs/"),
          col("doc_id").cast("string"),
          lit("?utm_source=feed&page="), pmod(col("doc_id"), lit(7)).cast("string"),
          lit("&gclid=x"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit("#top")).otherwise(lit("")))
        docs.select(
            col("doc_id"),
            graft.ops.Urls.normalizeUrl(url).as("url_norm"),
            graft.ops.Urls.hostOf(url).as("host"),
            graft.ops.Urls.registeredDomainOf(url).as("domain"))
          .orderBy("doc_id")
      },
      Some("""WITH u AS (
          SELECT doc_id,
            'HTTPS://WWW.' || UPPER(source) || '.Example.COM:443/Docs/' ||
            CAST(doc_id AS VARCHAR) || '?utm_source=feed&page=' ||
            CAST(doc_id % 7 AS VARCHAR) || '&gclid=x' ||
            CASE WHEN doc_id % 3 = 0 THEN '#top' ELSE '' END AS url
          FROM documents),
        steps AS (
          SELECT doc_id, url,
            REGEXP_REPLACE(TRIM(url), '#.*$', '', 'g') AS t
          FROM u),
        lowered AS (
          SELECT doc_id, url, t,
            LOWER(REGEXP_EXTRACT(t, '^([^/?#]*://[^/?#]*)', 1)) ||
              REGEXP_EXTRACT(t, '^[^/?#]*://[^/?#]*(.*)$', 1) AS l
          FROM steps),
        cleaned AS (
          SELECT doc_id, url, t,
            REGEXP_REPLACE(REGEXP_REPLACE(
              REGEXP_REPLACE(REGEXP_REPLACE(
                REGEXP_REPLACE(REGEXP_REPLACE(l,
                  '^(http://[^/?#:]*):80([/?#].*)?$', '\1\2', 'g'),
                  '^(https://[^/?#:]*):443([/?#].*)?$', '\1\2', 'g'),
                '([?&])((?:utm_[^=&]*|gclid|fbclid|msclkid|yclid)=[^&]*&)+', '\1', 'g'),
                '(?:[?&](?:utm_[^=&]*|gclid|fbclid|msclkid|yclid)=[^&]*)+$', '', 'g'),
              '[?&]+$', '', 'g'),
              '^([a-z][a-z0-9+.-]*://[^/?#]*)/$', '\1', 'g') AS n
          FROM lowered),
        hosts AS (
          SELECT doc_id,
            LOWER(REGEXP_EXTRACT(TRIM(url),
              '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:@]+)', 1)) AS host,
            CASE WHEN REGEXP_MATCHES(t, '^[A-Za-z][A-Za-z0-9+.-]*://') THEN n ELSE t END AS url_norm
          FROM cleaned),
        doms AS (
          SELECT doc_id, url_norm, host,
            REGEXP_REPLACE(host, '^www[0-9]*\.', '', 'g') AS h
          FROM hosts)
        SELECT doc_id, url_norm, host,
          CASE
            WHEN REGEXP_EXTRACT(h, '([^.]+\.(?:co|com|net|org|gov|ac|edu|ne|or)\.(?:uk|jp|au|nz|in|br|mx|cn|sg|tr|za|kr|id))$', 1) <> ''
              THEN REGEXP_EXTRACT(h, '([^.]+\.(?:co|com|net|org|gov|ac|edu|ne|or)\.(?:uk|jp|au|nz|in|br|mx|cn|sg|tr|za|kr|id))$', 1)
            WHEN REGEXP_EXTRACT(h, '([^.]+\.[^.]+)$', 1) <> ''
              THEN REGEXP_EXTRACT(h, '([^.]+\.[^.]+)$', 1)
            ELSE h END AS domain
        FROM doms
        ORDER BY doc_id""")),

    // ---- domain blocklist + per-domain stats (the anti-domination /
    // spam-feed cut): one synthetic domain per source, two blocked,
    // counts by registered domain over the survivors.
    Q("q128_domain_blocklist",
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
        val url = concat(lit("HTTP://"), upper(col("source")),
          lit(".COM:80/p/"), col("doc_id").cast("string"))
        graft.ops.Urls.dropBlockedDomains(
            docs.withColumn("__url", url), col("__url"),
            Seq("src3.com", "src7.com"))
          .groupBy(graft.ops.Urls.registeredDomainOf(col("__url")).as("domain"))
          .agg(count(lit(1)).as("n"))
          .orderBy("domain")
      },
      Some("""WITH d AS (
          SELECT LOWER(source) || '.com' AS domain FROM documents
          WHERE LOWER(source) || '.com' NOT IN ('src3.com', 'src7.com'))
        SELECT domain, COUNT(*) AS n FROM d
        GROUP BY domain ORDER BY domain""")),

    // ---- deterministic training-order shuffle (Sampling
    // .deterministicShuffle): shard + in-shard rank from the md5 coin —
    // the rerun-stable "randomize example order" step; the whole
    // permutation is engine-replayable.
    Q("q131_deterministic_shuffle",
      (s, dir) =>
        graft.ops.Sampling.deterministicShuffle(
            tbl(s, dir, "documents").select("doc_id", "source"),
            col("doc_id"), numShards = 8, seed = 42L)
          .select("doc_id", "shard", "pos")
          .orderBy("shard", "pos"),
      Some("""WITH h AS (
          SELECT doc_id,
            ('0x' || SUBSTRING(MD5('42:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hv
          FROM documents)
        SELECT doc_id, CAST(hv % 8 AS INTEGER) AS shard,
          CAST(ROW_NUMBER() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) - 1 AS BIGINT) AS pos
        FROM h ORDER BY shard, pos""")),

    // ---- URL-level dedup (Urls.dedupByUrl): three raw variants of each
    // page (mixed case + default port + utm param, fragment) collapse to
    // one canonical URL; the min-doc_id keeper survives with the
    // multiplicity. The oracle derives the canonical form directly —
    // the equivalence IS what the normalization chain (q127) guarantees.
    Q("q136_url_dedup",
      (s, dir) => {
        val page = pmod(col("doc_id"), lit(50)).cast("string")
        val url = when(pmod(col("doc_id"), lit(3)) === 0,
            concat(lit("https://www.site.com/p/"), page))
          .when(pmod(col("doc_id"), lit(3)) === 1,
            concat(lit("HTTPS://WWW.site.COM:443/p/"), page, lit("?utm_source=x")))
          .otherwise(concat(lit("https://www.site.com/p/"), page, lit("#frag")))
        graft.ops.Urls.dedupByUrl(
            tbl(s, dir, "documents").withColumn("__raw_url", url),
            col("__raw_url"), "doc_id")
          .select("doc_id", "n_copies").orderBy("doc_id")
      },
      Some("""SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        FROM documents GROUP BY doc_id % 50 ORDER BY doc_id""")),

    // ---- HTML text extraction (Redact.stripHtml): a full page wrapper
    // with style/script/comment blocks and the six common entities,
    // built identically in both engines; the extracted STRING is part
    // of the hash. Entities decode AFTER tag-stripping, so decoded
    // brackets survive as text.
    Q("q137_html_strip",
      (s, dir) => {
        val html = concat(
          lit("<html><head><style type=\"text/css\">p { color: red; }</style></head><body><!-- hidden -->"),
          lit("<h1>Doc "), col("doc_id").cast("string"), lit("</h1><p>"),
          col("text"),
          lit(" &amp; more &lt;b&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>"),
          lit("<script>var x = 1; </script></body></html>"))
        tbl(s, dir, "documents")
          .select(col("doc_id"),
            graft.ops.Redact.stripHtml(html).as("extracted"))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (
          SELECT doc_id,
            '<html><head><style type="text/css">p { color: red; }</style></head><body><!-- hidden -->'
            || '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || text
            || ' &amp; more &lt;b&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>'
            || '<script>var x = 1; </script></body></html>' AS html
          FROM documents),
        s1 AS (
          SELECT doc_id,
            REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(html,
              '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
              '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
              '(?s)<!--.*?-->', ' ', 'g'),
              '<[^>]+>', ' ', 'g') AS t
          FROM h),
        s2 AS (
          SELECT doc_id,
            REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
              REGEXP_REPLACE(REGEXP_REPLACE(t,
                '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
                '&quot;', '"', 'g'), '&#39;', CHR(39), 'g'), '&amp;', '&', 'g') AS t
          FROM s1)
        SELECT doc_id, TRIM(REGEXP_REPLACE(t, '\s+', ' ', 'g')) AS extracted
        FROM s2 ORDER BY doc_id"""))
  )
}
