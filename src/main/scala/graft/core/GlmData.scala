package graft.core

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Row-partitioned design matrix X (n×p) + target y, the engine's single
  * data abstraction: one Spark partition ≙ one dask chunk of the reference
  * (datasets.py:48-56 chunks rows, never columns).
  *
  * Public surface is DataFrame-first (`features: array<double>`,
  * `label: double` — FIXTURES.md schema); kernels run on the extracted
  * RDD so each pass is a single whole-stage scan with zero shuffles.
  */
final class GlmData(
    val rows: RDD[(Array[Double], Double)],
    val numFeatures: Int)
    extends Serializable {

  def persist(): this.type = {
    rows.persist(StorageLevel.MEMORY_AND_DISK)
    this
  }
  def unpersist(): this.type = { rows.unpersist(false); this }
  def numPartitions: Int = rows.getNumPartitions
  def repartition(n: Int): GlmData =
    new GlmData(rows.repartition(n), numFeatures)

  /** Appended-ones intercept, faithful to utils.py:139-162. */
  def addIntercept: GlmData =
    new GlmData(rows.map { case (x, y) =>
      val out = java.util.Arrays.copyOf(x, x.length + 1)
      out(x.length) = 1.0
      (out, y)
    }, numFeatures + 1)
}

object GlmData {

  /** From a DataFrame already in `(features: array<double>, label: double)`
    * shape. `numFeatures` avoids a driver job when known. */
  def fromDF(
      df: DataFrame,
      featuresCol: String = "features",
      labelCol: String = "label",
      numFeatures: Int = -1): GlmData = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df
      .select(
        col(featuresCol).cast("array<double>").as("features"),
        col(labelCol).cast("double").as("label"))
      .as[(Array[Double], Double)]
    val p = if (numFeatures > 0) numFeatures else ds.head()._1.length
    new GlmData(ds.rdd, p)
  }

  /** Table→matrix bridge: assemble numeric columns into the features
    * array + a label expression (the reference's `.values` path,
    * docs/examples/basic_api.ipynb). Column pruning reaches the scan. */
  def assemble(df: DataFrame, featureCols: Seq[String], label: Column): GlmData = {
    val feat = array(featureCols.map(c => col(c).cast("double")): _*)
    fromDF(
      df.select(feat.as("features"), label.cast("double").as("label")),
      numFeatures = featureCols.length)
  }

  /** DataFrame-side intercept append (for predict paths that stay in SQL). */
  def addInterceptCol(features: Column): Column =
    concat(features, array(lit(1.0)))
}
