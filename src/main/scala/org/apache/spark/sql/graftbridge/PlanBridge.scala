package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** Logical-plan lineage truncation for iterative DataFrame algorithms.
  *
  * An iterative loop that rebuilds a frame from its previous round
  * (`next = f(labels)` where `labels` appears more than once in `f`)
  * grows a logical-plan TREE exponentially — round k's plan embeds round
  * k-1's twice, so analysis, optimization, and the UI/listener plan
  * stringification all walk 2^k nodes even though the underlying RDD DAG
  * is a shared (linear) graph. Persisting does not help: caching short-
  * circuits execution, not the plan tree.
  *
  * `truncateLineage` rebuilds the frame as a one-node [[LogicalRDD]] over
  * its own physical RDD — the same construction `Dataset.checkpoint`
  * uses, minus the block materialization (the caller controls persistence
  * explicitly, so blocks free deterministically via `unpersist` rather
  * than on GC). Rows are copied (`_.copy()`) because operators reuse
  * UnsafeRow buffers; `LogicalRDD.fromDataset` preserves the frame's
  * output partitioning and ordering so downstream exchanges are not
  * re-introduced. Lives under org.apache.spark.sql to satisfy the
  * private[sql] scope of Dataset.ofRows / LogicalRDD.
  */
object PlanBridge {
  def truncateLineage(df: DataFrame): DataFrame = {
    val cds = df.asInstanceOf[ClassicDataset[Row]]
    val rdd = cds.queryExecution.toRdd.map(_.copy())
    ClassicDataset.ofRows(cds.sparkSession,
      LogicalRDD.fromDataset(rdd, cds, isStreaming = false).newInstance())
  }
}
