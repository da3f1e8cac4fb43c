package graft.examples

import graft.ops.{CharLm, Dedup, Dsir, Similarity}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The streaming end-to-end ingest: [[IncrementalIngest]]'s per-batch
  * admit decision composed as ONE structured stream — every modality's
  * clean filter runs per micro-batch against the same persisted
  * reference artifacts the batch path uses:
  *
  *   LM quality  → [[CharLm.qualityCleanStream]]   (broadcast model)
  *   DSIR domain → [[Dsir.qualityCleanStream]]     (broadcast ratios)
  *   exact       → [[Dedup.exactCleanStream]]      (reference dup keys)
  *   MinHash     → [[Dedup.minhashCleanStream]]    (persisted band table)
  *   SimHash     → [[Dedup.simhashCleanStream]]    (persisted fp table)
  *   semantic    → [[Dedup.cosineCleanStream]]     (reference embeddings,
  *                  after a stream-static id join attaches the vector)
  *
  * Every stage is a stateless broadcast projection or a stream-static
  * anti-join — no watermark, no state store — so [[admit]] accepts a
  * streaming OR a batch frame and produces the IDENTICAL admit set
  * (StreamingIngestSpec pins the composed stream to the composed batch
  * complement; each individual stage is already pinned to its own
  * complement by PipelineOpsSpec/CharLmSpec/DsirSpec). Per-row verdicts
  * are independent, so micro-batch boundaries cannot change the result.
  *
  * Run: sbt "runMain graft.examples.StreamingIngest [sfDir]"
  */
object StreamingIngest {

  /** Everything the per-micro-batch filters need, built/loaded ONCE:
    * two broadcast models plus four reference frames (each backed by a
    * persisted artifact in production — the [[IncrementalIngest]] build
    * step). `nBits` is the LSH bucket width shared by both sides of the
    * semantic filter. */
  final case class Artifacts(
      charLm: Broadcast[graft.functions.CharLmModel], maxAvgNll: Double,
      dsirRatio: Broadcast[Array[Long]], minLrNano: Long,
      refDocs: DataFrame,
      bands: DataFrame,
      simSig: DataFrame,
      refEmb: DataFrame, cosThreshold: Double, nBits: Int)

  /** The composed admit filter: a doc passes iff EVERY modality admits
    * it. `emb` is the static id→embedding side of the stream-static
    * join (the corpus embedding table); docs without an embedding row
    * are dropped by the inner join — an unembedded doc cannot take the
    * semantic check, and a filter admits on evidence, not absence. */
  def admit(newDocs: DataFrame, emb: DataFrame, a: Artifacts): DataFrame = {
    val q1 = CharLm.qualityCleanStream(newDocs, a.charLm, a.maxAvgNll)
    val q2 = Dsir.qualityCleanStream(q1, a.dsirRatio, a.minLrNano)
    val q3 = Dedup.exactCleanStream(q2, a.refDocs, Seq("text"))
    val q4 = Dedup.minhashCleanStream(q3, a.bands, "text")
    val q5 = Dedup.simhashCleanStream(q4, a.simSig, "text")
    val withVec = q5.join(
      emb.select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
    val bucket = Similarity.lshBucket(col("embedding"), dim = 64,
      nBits = a.nBits)
    Dedup.cosineCleanStream(withVec, a.refEmb, "embedding",
        a.cosThreshold, bucket)
      .drop("embedding")
  }

  /** Build AND PERSIST the reference artifacts from a curated slice —
    * the [[IncrementalIngest]] index-build step: signature tables land
    * as parquet under `idxDir` and are read back, so the filters consume
    * exactly what a production batch would (the write/read round trip is
    * part of the pinned path). The example and the spec share this one
    * code path. */
  def buildArtifacts(spark: SparkSession, refDocs: DataFrame,
      refEmb: DataFrame, targetDocs: DataFrame, idxDir: String): Artifacts = {
    val lm = spark.sparkContext.broadcast(
      CharLm.fit(CharLm.trainCounts(refDocs)))
    val dsir = Dsir.fit(Dsir.featureCounts(targetDocs),
      Dsir.featureCounts(refDocs))
    val ratio = spark.sparkContext.broadcast(dsir.ratioNano)
    // self-calibrated gates: admit docs at least as fluent as the 90th
    // percentile of the curated corpus (LM) and at least as target-like
    // as its bottom quartile (DSIR) — thresholds derived from the
    // reference's OWN score distribution, the way a production pipeline
    // tunes them, instead of magic constants that rot as corpora drift
    val maxAvgNll = CharLm.score(refDocs, lm, "text")
      .stat.approxQuantile("avg_nll", Array(0.9), 0.0).head
    val minLrNano = Dsir.score(refDocs, ratio, "doc_id", "text")
      .selectExpr("CAST(lr_nano AS DOUBLE) AS lr")
      .stat.approxQuantile("lr", Array(0.25), 0.0).head.toLong
    Dedup.writeBandedSignatures(refDocs, "doc_id", "text", s"$idxDir/mh_bands")
    Dedup.writeSimhashSignatures(refDocs, "doc_id", "text", s"$idxDir/sh_sig")
    Artifacts(lm, maxAvgNll, ratio, minLrNano,
      refDocs,
      spark.read.parquet(s"$idxDir/mh_bands"),
      spark.read.parquet(s"$idxDir/sh_sig"),
      refEmb, cosThreshold = 0.3, nBits = 4)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-streaming-ingest")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val refDocs = docs.filter(col("doc_id") < 300)
    val refEmb = emb.filter(col("vec_id") < 300)
    val batch = docs.filter(col("doc_id") >= 300)
      .select("doc_id", "text")

    val a = buildArtifacts(spark, refDocs, refEmb,
      targetDocs = refDocs.filter(col("source") === "src3"),
      idxDir = java.nio.file.Files.createTempDirectory("ingest_idx").toString)

    // batch-mode run of the same composition (the reference answer)
    if (sys.env.contains("GRAFT_INGEST_DEBUG")) {
      val s1 = CharLm.qualityCleanStream(batch, a.charLm, a.maxAvgNll)
      val s2 = Dsir.qualityCleanStream(s1, a.dsirRatio, a.minLrNano)
      val s3 = Dedup.exactCleanStream(s2, a.refDocs, Seq("text"))
      val s4 = Dedup.minhashCleanStream(s3, a.bands, "text")
      val s5 = Dedup.simhashCleanStream(s4, a.simSig, "text")
      println(s"[debug] lm=${s1.count()} dsir=${s2.count()} " +
        s"exact=${s3.count()} minhash=${s4.count()} simhash=${s5.count()}")
    }
    // DRIVER-STATE CAVEAT (100 TB posture): the example materializes
    // the admit-set ids on the driver to compare the batch and streamed
    // compositions set-for-set — that collect() is O(admitted docs) in
    // driver memory and is ONLY safe because this demo batch is bounded
    // (guarded below). A production equality check joins the two admit
    // frames (`batchFrame.join(streamFrame, "doc_id", "full_outer")`
    // with a null-count) and never collects; the pipeline itself needs
    // no driver state at any scale — admit() is pure projections and
    // stream-static joins end to end.
    val nBatch = batch.count()
    require(nBatch <= 1000000,
      s"StreamingIngest demo collects admit ids on the driver; batch of " +
        s"$nBatch docs exceeds the demo bound — use a join-based " +
        "comparison at this scale (see scaladoc above)")
    val batchAdmit = admit(batch, emb, a)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    println(s"[stream-ingest] batch-mode composition admits " +
      s"${batchAdmit.size} of ${batch.count()} docs")

    // the same composition as a structured stream, two micro-batches
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = admit(in.toDF().toDF("doc_id", "text"), emb, a)
      .writeStream.outputMode("append").format("memory")
      .queryName("ingest_admitted").start()
    try {
      val rows = batch.collect().map(r => (r.getLong(0), r.getString(1)))
      val (first, second) = rows.splitAt(rows.length / 2)
      in.addData(first.toSeq: _*)
      q.processAllAvailable()
      in.addData(second.toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("ingest_admitted")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      println(s"[stream-ingest] streamed composition admits " +
        s"${streamed.size}; equals batch: ${streamed == batchAdmit}")
      require(streamed == batchAdmit,
        "streamed admit set diverged from the batch composition")
    } finally q.stop()
    spark.stop()
  }
}
