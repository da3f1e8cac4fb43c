package graft.datasets

import graft.core.GlmData
import graft.families.Family
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded synthetic generators mirroring the reference's semantics
  * (datasets.py:8-162, utils.py:165-169): X ~ N(0,1) row-chunked, a random
  * informative column subset with β = (U(0,1)−1)·scale, and family-specific
  * label rules. RNG streams differ from numpy (documented capability-level
  * parity, not bit parity); same seed ⇒ bit-identical output here.
  *
  * Distribution: rows are generated partition-parallel with per-partition
  * counters (`spark.range` + seeded `randn`/`rand`), never on the driver —
  * the pattern scales to arbitrary n.
  */
object Datasets {

  /** Spark's `rand`/`randn` initialize each partition's RNG as
    * `XORShiftRandom(seed + partitionIndex)`, so two columns whose seeds
    * differ by less than the partition count share identical streams at
    * a partition offset: with `seed + j` per column, x_{j+1} in
    * partition p equals x_j in partition p+1 row-for-row — the design
    * matrix's columns become chunk-shifted copies of each other
    * (spurious cross-column correlation, phantom predictive power for
    * "noise" columns). Spacing the seeds by a prime stride ≫ any
    * realistic partition count keeps every column (and the label) on a
    * disjoint stream. */
  private val SeedStride = 1000003L

  private def baseX(
      spark: SparkSession,
      nSamples: Long,
      nFeatures: Int,
      chunksize: Int,
      seed: Long): DataFrame = {
    val nParts = math.max(1, math.ceil(nSamples.toDouble / chunksize).toInt)
    val cols = (0 until nFeatures).map(j => randn(seed + j * SeedStride).as(s"x$j"))
    spark.range(0, nSamples, 1, nParts).select(col("id") +: cols: _*)
  }

  private def informativeBeta(
      nFeatures: Int,
      nInformative: Int,
      scale: Double,
      seed: Long): (Array[Int], Array[Double]) = {
    val rng = new scala.util.Random(seed)
    // np.random.choice with replacement (datasets.py:52)
    val idx = Array.fill(nInformative)(rng.nextInt(nFeatures))
    val beta = Array.fill(nFeatures)((rng.nextDouble() - 1.0) * scale)
    (idx, beta)
  }

  private def z0Col(idx: Array[Int], beta: Array[Double]) =
    idx.map(j => col(s"x$j") * lit(beta(j))).reduceOption(_ + _).getOrElse(lit(0.0))

  /** The reference's `is_sparse=True` (datasets.py:51-52) is a STORAGE-
    * FORMAT switch, not a sparsity-pattern change: the same gaussian X
    * wrapped in sparse.COO blocks. Mirrored as MLlib SparseVector rows —
    * identical values, and downstream the sparse dispatch engages
    * (normalize auto-disable at Estimators, foreachActive kernels, no
    * densify in the ADMM pack). */
  private val toSparseVec = udf { (a: Seq[Double]) =>
    org.apache.spark.ml.linalg.Vectors.dense(a.toArray).toSparse
  }

  private def maybeSparse(df: DataFrame, isSparse: Boolean): DataFrame =
    if (!isSparse) df
    else df.withColumn("features", toSparseVec(col("features")))

  /** Classification: y = U(0,1) < σ(X_inf·β_inf) (datasets.py:8-57). */
  def makeClassification(
      spark: SparkSession,
      nSamples: Long = 1000,
      nFeatures: Int = 100,
      nInformative: Int = 2,
      scale: Double = 1.0,
      chunksize: Int = 100,
      seed: Long = 42,
      isSparse: Boolean = false): DataFrame = {
    val x = baseX(spark, nSamples, nFeatures, chunksize, seed)
    val (idx, beta) = informativeBeta(nFeatures, nInformative, scale, seed)
    val z0 = z0Col(idx, beta)
    // label seed offset is NEGATIVE and stride-scaled: feature column j
    // draws from seed + j·stride, so the label stream (seed − 7919·stride)
    // stays disjoint from every feature stream at any partition offset
    // (the label "noise" would otherwise share an RNG stream with a
    // feature and show spurious predictive power)
    maybeSparse(x.withColumn("label",
        (rand(seed - 7919 * SeedStride) < lit(1.0) / (lit(1.0) + exp(-z0))).cast("double"))
      .withColumn("features", array((0 until nFeatures).map(j => col(s"x$j")): _*))
      .select("id", "features", "label"), isSparse)
  }

  /** Regression: y = U(0,1) — deliberately trivial noise (datasets.py:60-109). */
  def makeRegression(
      spark: SparkSession,
      nSamples: Long = 1000,
      nFeatures: Int = 100,
      nInformative: Int = 2,
      scale: Double = 1.0,
      chunksize: Int = 100,
      seed: Long = 42,
      isSparse: Boolean = false): DataFrame = {
    val x = baseX(spark, nSamples, nFeatures, chunksize, seed)
    maybeSparse(x.withColumn("label", rand(seed - 7919 * SeedStride))
      .withColumn("features", array((0 until nFeatures).map(j => col(s"x$j")): _*))
      .select("id", "features", "label"), isSparse)
  }

  /** Poisson: rate = exp(z0); y ~ Poisson(rate) via per-row inversion
    * sampling (datasets.py:112-162; the reference's `size=1` quirk is not
    * reproduced — its own docstring documents shape (n,)). */
  def makePoisson(
      spark: SparkSession,
      nSamples: Long = 1000,
      nFeatures: Int = 100,
      nInformative: Int = 2,
      scale: Double = 1.0,
      chunksize: Int = 100,
      seed: Long = 42,
      isSparse: Boolean = false): DataFrame = {
    val x = baseX(spark, nSamples, nFeatures, chunksize, seed)
    val (idx, beta) = informativeBeta(nFeatures, nInformative, scale, seed)
    val z0 = z0Col(idx, beta)
    // Knuth-style Poisson sampler driven by a seeded uniform per row:
    // deterministic given (seed, id); rates here are O(1) so the loop is
    // short. Codegen-unfriendly UDF acceptable for a test-data generator.
    // Rates are clamped at 700: exp(-rate) underflows to exactly 0.0
    // past ~745, which would pin every such label to the 10000-iteration
    // loop cap regardless of u (silently wrong labels at large `scale`).
    val poissonUdf = udf { (rate0: Double, u: Double) =>
      val rate = math.min(rate0, 700.0)
      var k = 0
      var cdf = math.exp(-rate)
      var p = cdf
      while (u > cdf && k < 10000) {
        k += 1
        p = p * rate / k
        cdf += p
      }
      k.toDouble
    }
    maybeSparse(x.withColumn("label", poissonUdf(exp(z0), rand(seed - 7919 * SeedStride)))
      .withColumn("features", array((0 until nFeatures).map(j => col(s"x$j")): _*))
      .select("id", "features", "label"), isSparse)
  }

  /** `make_y` test helper: y = U(0,1) < σ(X·β), default β=[1.5,−3]
    * (utils.py:165-169). */
  def makeY(df: DataFrame, beta: Array[Double] = Array(1.5, -3.0), seed: Long = 42): DataFrame = {
    // fused ArrayDot — same left fold as the zip_with+aggregate
    // composition (bit-identical, see Estimators.marginCol), one dot
    // formulation to reason about instead of two
    val z0 = graft.functions.MathFunctions.dotConst(col("features"), beta.toSeq)
    // stride-scaled like the generator seeds (see SeedStride): keeps the
    // label draw off every feature column's RNG stream at any partition
    // offset, and distinct from makeClassification's label stream
    df.withColumn("label",
      (rand(seed - 104729 * SeedStride) < lit(1.0) / (lit(1.0) + exp(-z0))).cast("double"))
  }

  /** `make_intercept_data` (test_algos_families.py:21-37): X ~ U(0,1),
    * columns divided by their sums, last column = 1; y = make_y(X, β~U(0,1)). */
  def makeInterceptData(spark: SparkSession, n: Int, p: Int, seed: Long = 20009): GlmData = {
    val nParts = 5 // reference chunks (N/5, p+1)
    val cols = (0 to p).map(j => rand(seed + j * SeedStride).as(s"x$j"))
    var df = spark.range(0, n, 1, nParts).select(col("id") +: cols: _*)
    df = df.withColumn(s"x$p", lit(1.0))
    val sums = df.select((0 to p).map(j => sum(col(s"x$j")).as(s"s$j")): _*).head()
    val scaled = (0 to p).map(j => (col(s"x$j") / lit(sums.getDouble(j))).as(s"x$j"))
    df = df.select(col("id") +: scaled: _*).withColumn(s"x$p", lit(1.0))
    val rng = new scala.util.Random(seed)
    val beta = Array.fill(p + 1)(rng.nextDouble())
    val withFeat = df
      .withColumn("features", array((0 to p).map(j => col(s"x$j")): _*))
    GlmData.fromDF(makeY(withFeat, beta, seed), numFeatures = p + 1)
  }

  /** Wide-SPARSE text featurization: hashed bag-of-words over a text
    * column as MLlib SparseVector rows (Spark's murmur3 HashingTF — the
    * standard hashing-trick featurizer), p = `numFeatures` buckets. This
    * is the reference's sparse fit shape (estimators.py:82-84 routes
    * sparse.COO through the same solvers) at production text width:
    * p ≈ 10⁴ features, ~tokens-per-doc nonzeros per row, so the
    * downstream sparse dispatch — foreachActive kernels, no densify in
    * the ADMM pack, normalize auto-disable — carries ALL the work. The
    * frame keeps every input column and appends `features`; rows stay
    * O(nnz), never O(p). */
  def hashedBow(df: DataFrame, textCol: String,
      numFeatures: Int = 8192, outputCol: String = "features"): DataFrame = {
    require(numFeatures >= 2, s"numFeatures must be >= 2, got $numFeatures")
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("__toks").setOutputCol(outputCol)
      .setNumFeatures(numFeatures)
    tf.transform(df.withColumn("__toks", split(col(textCol), "\\s+")))
      .drop("__toks")
  }
}
