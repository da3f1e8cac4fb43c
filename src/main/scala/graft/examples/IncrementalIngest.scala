package graft.examples

import graft.ops.{CharLm, Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable tour of the DAILY-INGEST surface: a production pipeline
  * rarely deduplicates from scratch — it holds a curated reference
  * corpus plus build-once index artifacts, and each incoming batch is
  * checked against them. This example builds the reference artifacts
  * (banded MinHash signature table, IVF centroid table) once, then runs
  * a new batch through the full incremental family:
  *
  *   0. quality    — [[CharLm.score]] perplexity gate under the model
  *                   refit from the PERSISTED trigram-counts table
  *                   (gibberish drops before any dedup work is spent)
  *   1. exact      — [[Dedup.exactMatchesAgainst]] (bloom-eligible semi-join)
  *   2. MinHash    — [[Dedup.minhashCandidatesAgainstBands]] against the
  *                   PERSISTED signature table (zero reference-text reads)
  *   3. SimHash    — [[Dedup.simhashNearDupsAgainstBands]] against the
  *                   PERSISTED fingerprint table (zero reference-text
  *                   reads; [[Dedup.simhashNearDupsAgainst]] is the
  *                   recompute form)
  *   4. semantic   — [[Dedup.semDedupAgainst]] (shared broadcast
  *                   centroids, per-(cell, sub-bucket) reference cap)
  *
  * and anti-joins the flagged ids out — the admit/reject decision a
  * curation loop makes per batch. Every step's reference side is capped
  * asymmetrically (a reference boilerplate flood cannot multiply the
  * batch) while the NEW side is never capped (every incoming row gets
  * its verdict). The admitted batch then maintains the index:
  *
  *   5. ANN index  — [[Similarity.ivfPqEncodeAppend]] appends the
  *                   admitted embeddings to the persisted IVF-PQ codes
  *                   table under the FROZEN build-time centroids +
  *                   codebooks; queries keep running unchanged.
  *
  * The same pipeline runs as a STREAM: [[CharLm.qualityCleanStream]],
  * [[Dedup.exactCleanStream]], [[Dedup.minhashCleanStream]],
  * [[Dedup.simhashCleanStream]], and [[Dedup.cosineCleanStream]] are
  * the per-micro-batch forms of steps 0-4 (stateless scoring and
  * stream-static anti-joins against the same persisted reference
  * artifacts — each spec-pinned to its batch complement in
  * PipelineOpsSpec / CharLmSpec).
  *
  * Run: sbt "runMain graft.examples.IncrementalIngest [sfDir]"
  */
object IncrementalIngest {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-incremental-ingest")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // reference = the curated corpus on disk; batch = today's crawl
    val refDocs = docs.filter(col("doc_id") < 400)
    val batchDocs = docs.filter(col("doc_id") >= 400)
    val refEmb = emb.filter(col("vec_id") < 400)
    val batchEmb = emb.filter(col("vec_id") >= 400)

    // ---- index build (once per reference corpus, not per batch):
    // signature table, centroids, PQ codebooks, and the full-corpus
    // IVF-PQ encode all happen HERE; every artifact is persisted so the
    // per-batch section below only LOADS state and appends ----
    val tmp = java.nio.file.Files.createTempDirectory("ingest_idx").toString
    Dedup.writeBandedSignatures(refDocs, "doc_id", "text", s"$tmp/mh_bands")
    Dedup.writeSimhashSignatures(refDocs, "doc_id", "text", s"$tmp/sh_sig")
    val cents = Similarity.trainIvfCentroids(refEmb, "embedding",
      kCells = 8, iters = 3, seed = 11L)
    Similarity.saveCentroids(spark, cents, s"$tmp/centroids")
    val cbs = Similarity.trainPqCodebooks(refEmb, "embedding", dim = 64,
      m = 4, ksub = 8, iters = 2)
    Similarity.saveCodebooks(spark, cbs, s"$tmp/codebooks")
    Similarity.ivfPqEncode(refEmb, "vec_id", "embedding", cents, cbs,
      s"$tmp/ivfpq")
    // the LM quality model persists as its counts table — refitting from
    // the table is exact (CharLmSpec pins the round trip), so per-batch
    // runs LOAD the counts instead of re-scanning reference text
    CharLm.trainCounts(refDocs).write.parquet(s"$tmp/charlm_counts")
    println(s"[ingest] built reference artifacts under $tmp")

    // ---- step 0, per batch: perplexity quality gate BEFORE any dedup
    // work — dropping gibberish first shrinks every downstream check's
    // input ([[CharLm.qualityCleanStream]] is the per-micro-batch form)
    val lm = spark.sparkContext.broadcast(
      CharLm.fit(spark.read.parquet(s"$tmp/charlm_counts")))
    val batchScored = CharLm.score(batchDocs, lm, "text")
    val batchClean = batchScored
      .filter(col("n_tri") > 0 && col("avg_nll") <= 7.0)
      .drop("n_tri", "nll_nano", "avg_nll")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[ingest] quality gate admitted ${batchClean.count()} of " +
      s"${batchDocs.count()} batch docs")

    // ---- per-batch checks. Each pair frame is persisted: it feeds its
    // own count AND the flagged-id union below, and without the persist
    // each downstream action would re-run the full shingling/banding/
    // fingerprinting pipeline (the multi-consumer contract the Dedup
    // object doc spells out) ----
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val exactIds = Dedup.exactMatchesAgainst(batchClean, refDocs,
      "doc_id", Seq("text")).persist(MEMORY_AND_DISK)
    println(s"[ingest] exact duplicates of reference: ${exactIds.count()}")

    val bands = spark.read.parquet(s"$tmp/mh_bands")
    val mhPairs = Dedup.minhashCandidatesAgainstBands(batchClean, bands,
      "doc_id", "text").persist(MEMORY_AND_DISK)
    println(s"[ingest] minhash candidates vs signature table: ${mhPairs.count()}")

    val shPairs = Dedup.simhashNearDupsAgainstBands(batchClean,
      spark.read.parquet(s"$tmp/sh_sig"), "doc_id", "text",
      maxHamming = 3).persist(MEMORY_AND_DISK)
    println(s"[ingest] simhash near-dups (hamming <= 3): ${shPairs.count()}")

    val loaded = Similarity.loadCentroids(spark, s"$tmp/centroids")
    val cleanEmb = batchEmb.join(
      batchClean.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val semPairs = Dedup.semDedupAgainst(cleanEmb, refEmb,
      "vec_id", "embedding", loaded, threshold = 0.3, roundDp = 6)
      .persist(MEMORY_AND_DISK)
    println(s"[ingest] semantic near-dups (cos >= 0.3): ${semPairs.count()}")

    // ---- admit decision: drop any batch doc flagged by a text check
    // OR whose embedding was flagged semantically (vec_id keys the same
    // documents in this corpus) ----
    val flaggedDocs = exactIds
      .union(mhPairs.select(col("new_id").as("doc_id")))
      .union(shPairs.select(col("new_id").as("doc_id")))
      .union(semPairs.select(col("new_id").as("doc_id")))
      .distinct()
      .persist(MEMORY_AND_DISK)
    val admitted = batchClean.join(flaggedDocs, Seq("doc_id"), "left_anti")
    println(s"[ingest] admitted ${admitted.count()} of ${batchClean.count()} " +
      s"batch docs (${flaggedDocs.count()} flagged)")

    // ---- index maintenance: the admitted docs join the corpus, so
    // their embeddings are APPENDED to the persisted IVF-PQ index under
    // the frozen build-time centroids/codebooks, LOADED back from the
    // build artifacts — never retrain at ingest time (a retrain
    // renumbers cells/codes and corrupts every previously-written row;
    // the codes table's metadata columns make the query path fail loudly
    // on exactly that mistake, see ivfPqEncodeAppend's scaladoc) ----
    val loadedCbs = Similarity.loadCodebooks(spark, s"$tmp/codebooks")
    val admittedEmb = cleanEmb.join(
      admitted.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    Similarity.ivfPqEncodeAppend(admittedEmb, "vec_id", "embedding",
      loaded, loadedCbs, s"$tmp/ivfpq")
    println(s"[ingest] IVF-PQ index grew to " +
      s"${spark.read.parquet(s"$tmp/ivfpq").count()} rows")

    spark.stop()
  }
}
