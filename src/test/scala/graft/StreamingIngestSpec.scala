package graft

import graft.examples.StreamingIngest
import graft.ops.{CharLm, Dedup, Dsir, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed streaming ingest (examples.StreamingIngest.admit): the
  * end-to-end micro-batch admit set must equal the batch complement
  * composed INDEPENDENTLY from the batch-mode operators (score+filter,
  * exactMatchesAgainst, minhashCandidatesAgainstBands,
  * simhashNearDupsAgainstBands, cosineContaminated) — not just the same
  * clean-stream functions run on a static frame. Each individual stage
  * is already pinned to its own complement (PipelineOpsSpec / CharLmSpec
  * / DsirSpec); this pins the COMPOSITION, including the stream-static
  * embedding join, across micro-batch boundaries. */
class StreamingIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("composed stream admits exactly the independently-composed batch complement") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val refDocs = docs.filter($"doc_id" < 300)
    val refEmb = emb.filter($"vec_id" < 300)
    val batch = docs.filter($"doc_id" >= 300).select("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("ingest_spec").toString
    val a = StreamingIngest.buildArtifacts(spark, refDocs, refEmb,
      targetDocs = refDocs.filter($"source" === "src3"), idxDir = idx)

    // ---- independent batch complement from the batch-mode operators
    val lmKeep = CharLm.score(batch, a.charLm, "text")
      .filter($"n_tri" > 0 && $"avg_nll" <= a.maxAvgNll)
      .drop("n_tri", "nll_nano", "avg_nll")
    val dsirKeep = Dsir.score(lmKeep, a.dsirRatio, "doc_id", "text")
      .filter($"lr_nano" >= a.minLrNano)
      .drop("n_feats", "lr_nano")
    val exactFlag = Dedup.exactMatchesAgainst(dsirKeep, refDocs,
      "doc_id", Seq("text"))
    val mhFlag = Dedup.minhashCandidatesAgainstBands(dsirKeep, a.bands,
      "doc_id", "text").select($"new_id".as("doc_id"))
    val shFlag = Dedup.simhashNearDupsAgainstBands(dsirKeep, a.simSig,
      "doc_id", "text", maxHamming = 3).select($"new_id".as("doc_id"))
    val textKeep = dsirKeep
      .join(exactFlag.union(mhFlag).union(shFlag).distinct(),
        Seq("doc_id"), "left_anti")
    val withVec = textKeep.join(
      emb.select($"vec_id".as("doc_id"), $"embedding"), Seq("doc_id"))
    val bucket = Similarity.lshBucket($"embedding", dim = 64, nBits = a.nBits)
    val cosFlag = Dedup.cosineContaminated(
      withVec.select($"doc_id".as("vec_id"), $"embedding"), refEmb,
      "vec_id", "embedding", threshold = a.cosThreshold, bucketCol = bucket)
    val expected = withVec
      .join(cosFlag.select($"vec_id".as("doc_id")), Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty && expected.size < 200,
      s"degenerate fixture: ${expected.size} admitted — thresholds no longer discriminate")

    // ---- the SAME composition on the static frame (admit is
    // stream/batch agnostic)
    val staticAdmit = StreamingIngest.admit(batch, emb, a)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(staticAdmit === expected)

    // ---- and as a real structured stream, across THREE uneven
    // micro-batches (boundaries must not change any verdict)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingIngest.admit(in.toDF().toDF("doc_id", "text"), emb, a)
      .writeStream.outputMode("append").format("memory")
      .queryName("ingest_spec_out").start()
    try {
      val rows = batch.collect().map(r => (r.getLong(0), r.getString(1)))
      in.addData(rows.take(20).toSeq: _*)
      q.processAllAvailable()
      in.addData(rows.slice(20, 150).toSeq: _*)
      q.processAllAvailable()
      in.addData(rows.drop(150).toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("ingest_spec_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed === expected)
    } finally q.stop()
  }
}
