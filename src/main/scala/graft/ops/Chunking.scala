package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for embedding/retrieval pipelines: split each doc
  * into overlapping token windows — the step between an ingested corpus
  * and an embedding table (one vector per chunk, not per doc).
  *
  * Chunk k covers tokens [k·step, k·step + chunkSize) with
  * step = chunkSize − overlap; the last chunk may be short, and every
  * doc emits at least one chunk (possibly shorter than `chunkSize`).
  * Pure per-row fan-out: no shuffle, output cardinality ≈
  * corpus_tokens / step. The token array is materialized before the
  * chunk lambda reads it (interpreted HOFs re-evaluate inline
  * expressions per element — see Dedup.jaccardVerify).
  */
object Chunking {

  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val step = chunkSize - overlap
    val n = size(col("__toks"))
    // 1 chunk when n <= chunkSize; else 1 + ceil((n - chunkSize) / step)
    // in integer math: 1 + (n - chunkSize + step - 1) div step
    val nChunks = when(n <= chunkSize, lit(1))
      .otherwise(lit(1) + floor((n - chunkSize + step - 1) / lit(step)).cast("int"))
    val chunks = transform(sequence(lit(0), nChunks - 1), k =>
      struct(k.as("chunk_id"),
        concat_ws(" ", slice(col("__toks"), k * step + 1, lit(chunkSize)))
          .as("chunk_text"),
        least(n - k * step, lit(chunkSize)).as("chunk_tokens")))
    df.withColumn("__toks", split(col(textCol), " +"))
      .withColumn("__n_chunks", nChunks)
      .select(col(idCol), col("__n_chunks").as("n_chunks"),
        explode(chunks).as("__c"))
      .select(col(idCol), col("n_chunks"),
        col("__c.chunk_id").as("chunk_id"),
        col("__c.chunk_text").as("chunk_text"),
        col("__c.chunk_tokens").as("chunk_tokens"))
  }
}
