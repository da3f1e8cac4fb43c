package graft.core

import org.apache.spark.ml.linalg.{DenseVector => MlDense, SparseVector => MlSparse, Vector => MlVector, Vectors}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Row-partitioned design matrix X (n×p) + target y, the engine's single
  * data abstraction: one Spark partition ≙ one dask chunk of the reference
  * (datasets.py:48-56 chunks rows, never columns).
  *
  * Rows are MLlib vectors, so dense AND sparse backends share one kernel
  * path without densifying (the reference's numpy/sparse.COO dispatch,
  * utils.py:54-146) — sparse rows accumulate via `foreachActive`, exactly
  * MLlib's own GLM kernel idiom.
  *
  * Public surface is DataFrame-first (`features: array<double>` or
  * `VectorUDT`, `label: double` — FIXTURES.md schema); kernels run on the
  * extracted RDD so each pass is a single whole-stage scan, no shuffles.
  */
final class GlmData(
    val rows: RDD[(MlVector, Double)],
    val numFeatures: Int,
    /** FIRST-ROW heuristic, not an any-row scan: `fromDF` samples only the
      * first vector (a full pass to decide would cost a job). Kernels and
      * ADMM packing dispatch per row regardless, so a mixed dense/sparse
      * input mis-flagged here stays CORRECT — a dense-first mix merely
      * keeps normalization on (the conservative direction is sparse-first,
      * which disables it, estimators.py:82-84). */
    val isSparse: Boolean)
    extends Serializable {

  /** Persist AND truncate lineage. Without truncation every solver job
    * re-serializes the full upstream lineage — the DataFrame scan plan,
    * file listings, codegen state — into its task binary, which at sf0.1
    * is a 4–8 MiB broadcast PER ITERATION (DAGScheduler "broadcasting
    * large task binary" warnings); on a real cluster that is per-iteration
    * scheduler latency that grows with the input's metadata, not its data.
    * `localCheckpoint` makes the cached blocks themselves the lineage
    * after the first action, so iteration N>1 ships only the O(k·p)
    * solver state. Tradeoff: lost cache blocks cannot be recomputed —
    * the standard iterative-ML bargain (GraphX/ALS checkpoint the same
    * way); safe here because solvers own the persist→fit→unpersist
    * lifecycle (Estimators.fit) and nothing reads `rows` after unpersist. */
  def persist(): this.type = persist(StorageLevel.MEMORY_AND_DISK)

  /** `level` chooses the cache format: the MEMORY_AND_DISK default keeps
    * rows as live objects (fastest per-iteration scan — the MLlib
    * idiom); MEMORY_AND_DISK_SER shrinks the footprint ~3× ((vector,
    * label) rows dominated by object headers serialize to little more
    * than their 8-byte doubles) at a per-iteration deserialization cost.
    * The knob matters when rows × p approaches executor memory: the
    * measured cliff (docs/ROUND9.md) is a 180M-row fit whose ~27 GB
    * object cache OOMs a 24 GB heap and GC-thrashes a 48 GB one, while
    * the same fit serialized stays resident and linear. Values are
    * IEEE-exact either way — a serialized cache round-trips the same
    * bits, so fits are bit-identical (EstimatorsSpec pins this). */
  def persist(level: StorageLevel): this.type = {
    rows.persist(level)
    rows.localCheckpoint()
    this
  }
  def unpersist(): this.type = { rows.unpersist(false); this }
  def numPartitions: Int = rows.getNumPartitions

  /** Deterministic repartition. RDD.repartition's round-robin scatter is
    * deterministic, but the REDUCE side concatenates incoming blocks in
    * fetch-arrival order — so within-partition row order (hence per-
    * partition float accumulation order in every kernel) varies run to
    * run, silently voiding the bit-determinism contract
    * [[graft.linalg.Kernels.partitionAggregate]] documents. Keying rows
    * by their global index and `repartitionAndSortWithinPartitions`
    * restores a total order: assignment is `index mod n` (exactly the
    * round-robin balance) and each partition is sorted by index. Costs
    * one extra pass (zipWithIndex's partition-size count job) at
    * repartition time only — no per-iteration cost. */
  def repartition(n: Int): GlmData = {
    require(n > 0, s"repartition: partition count must be positive, got $n")
    val keyed = rows.zipWithIndex().map { case (r, i) => (i, r) }
    val parted = keyed
      .repartitionAndSortWithinPartitions(new org.apache.spark.HashPartitioner(n))
      .map(_._2)
    new GlmData(parted, numFeatures, isSparse)
  }

  /** Appended-ones intercept, faithful to utils.py:139-162 (sparse stays
    * sparse — the reference concatenates a sparse ones column). */
  def addIntercept: GlmData = {
    val p = numFeatures
    new GlmData(rows.map { case (x, y) =>
      val appended: MlVector = x match {
        case d: MlDense =>
          // fail loudly on a ragged row: copyOf would silently ZERO-PAD
          // a short row (missing features become 0.0 in the fit) or
          // TRUNCATE a long one — numFeatures is inferred from the
          // first row only, so one malformed row corrupts the model
          // with no error
          if (d.values.length != p)
            throw new IllegalArgumentException(
              s"ragged row: vector of dim ${d.values.length}, expected $p")
          val out = java.util.Arrays.copyOf(d.values, p + 1)
          out(p) = 1.0
          new MlDense(out)
        case s: MlSparse =>
          // same fail-loud contract as the dense arm: a short sparse row
          // would otherwise pass SparseVector's own validation and be
          // silently zero-padded to dim p+1 (missing features become 0.0
          // in the fit); an oversized one would die on a misleading
          // "decreasing indices" require from appending index p
          if (s.size != p)
            throw new IllegalArgumentException(
              s"ragged row: sparse vector of dim ${s.size}, expected $p")
          val idx = java.util.Arrays.copyOf(s.indices, s.indices.length + 1)
          val vs = java.util.Arrays.copyOf(s.values, s.values.length + 1)
          idx(s.indices.length) = p
          vs(s.values.length) = 1.0
          new MlSparse(p + 1, idx, vs)
      }
      (appended, y)
    }, p + 1, isSparse)
  }
}

object GlmData {

  /** From a DataFrame with `(features, label)` where features is either
    * `array<double>` or an MLlib `VectorUDT` column. */
  def fromDF(
      df: DataFrame,
      featuresCol: String = "features",
      labelCol: String = "label",
      numFeatures: Int = -1): GlmData = {
    val isVectorUdt = df.schema(featuresCol).dataType.typeName == "vector"
    val selected = df.select(col(featuresCol), col(labelCol).cast("double"))
    // fail-fast null hygiene: a NULL features cell would otherwise reach
    // the kernels as a Scala null and die mid-job with an opaque
    // MatchError; a NULL label or a NULL ELEMENT inside the array would
    // NPE on unboxing — none of those stack traces says "your input had
    // nulls". Same contract as the ops layer (drop or impute first).
    def nullRow(r: org.apache.spark.sql.Row): Boolean =
      r.isNullAt(0) || r.isNullAt(1)
    val nullMsg =
      s"null $featuresCol/$labelCol row reached GlmData — drop or impute NULLs before fitting"
    val rdd: RDD[(MlVector, Double)] =
      if (isVectorUdt)
        selected.rdd.map { r =>
          if (nullRow(r)) throw new IllegalArgumentException(nullMsg)
          (r.getAs[MlVector](0), r.getDouble(1))
        }
      else
        selected
          .select(col(featuresCol).cast("array<double>"), col(labelCol))
          .rdd.map { r =>
            if (nullRow(r)) throw new IllegalArgumentException(nullMsg)
            val seq = r.getSeq[java.lang.Double](0)
            val arr = new Array[Double](seq.length)
            var i = 0
            val it = seq.iterator
            while (it.hasNext) {
              val v = it.next()
              if (v == null)
                throw new IllegalArgumentException(
                  s"null element inside $featuresCol array — " +
                    "drop or impute NULLs before fitting")
              arr(i) = v.doubleValue()
              i += 1
            }
            (Vectors.dense(arr), r.getDouble(1))
          }
    val (p, sparse) =
      if (numFeatures > 0 && !isVectorUdt) (numFeatures, false)
      else {
        val first =
          try rdd.first()._1
          catch {
            case _: UnsupportedOperationException | _: NoSuchElementException =>
              throw new IllegalArgumentException(
                "empty dataset: GlmData requires at least one row to infer numFeatures")
          }
        (if (numFeatures > 0) numFeatures else first.size,
         first.isInstanceOf[MlSparse])
      }
    new GlmData(rdd, p, sparse)
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
