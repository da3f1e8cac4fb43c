package graft

import graft.datasets.Datasets
import graft.estimators.{GlmParams, LogisticRegression, PoissonRegression}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generator semantics (datasets.py:8-162): shapes, determinism,
  * informative-feature signal, Poisson label distribution. */
class DatasetsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("make_classification: shape, chunking, boolean-as-double labels") {
    val df = Datasets.makeClassification(spark, nSamples = 500, nFeatures = 10,
      chunksize = 100, seed = 9)
    assert(df.count() == 500)
    assert(df.rdd.getNumPartitions == 5) // ceil(500/100) chunks
    val labels = df.select(collect_set(col("label"))).head().getSeq[Double](0).toSet
    assert(labels.subsetOf(Set(0.0, 1.0)))
    assert(df.select(size(col("features"))).head().getInt(0) == 10)
  }

  test("is_sparse mirrors the dense values in SparseVector storage (datasets.py:51-52)") {
    // the reference's flag wraps the SAME gaussian X in sparse.COO blocks;
    // ours must produce identical values stored as MLlib SparseVector
    val dense = Datasets.makeClassification(spark, 200, 4, seed = 77)
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Double](1).toArray.toSeq, r.getDouble(2)))).toMap
    val sparse = Datasets.makeClassification(spark, 200, 4, seed = 77,
      isSparse = true).collect()
    assert(sparse.length == 200)
    sparse.foreach { r =>
      val v = r.getAs[org.apache.spark.ml.linalg.Vector](1)
      assert(v.isInstanceOf[org.apache.spark.ml.linalg.SparseVector],
        s"row ${r.getLong(0)} not sparse: ${v.getClass}")
      val (denseVals, denseLabel) = dense(r.getLong(0))
      assert(v.toArray.toSeq == denseVals, s"row ${r.getLong(0)} values differ")
      assert(r.getDouble(2) == denseLabel)
    }
  }

  test("feature columns are independent streams, not partition-shifted copies") {
    // Spark seeds each partition's RNG as XORShiftRandom(seed + partIdx),
    // so per-column seeds spaced by 1 made x_{j+1}(row r) == x_j(row
    // r + chunksize) exactly — the design matrix's columns were shifted
    // copies of one another. The stride fix must leave NO such collision.
    val n = 400; val chunk = 100
    val rows = Datasets.makeClassification(spark, n, nFeatures = 3,
        chunksize = chunk, seed = 42)
      .select("id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1).map(_._2)
    for (j <- 0 until 2; r <- 0 until (n - chunk)) {
      assert(rows(r + chunk)(j) != rows(r)(j + 1),
        s"x${j + 1}(row $r) duplicates x$j(row ${r + chunk}) — seed collision")
    }
  }

  test("same seed => bit-identical dataset; different seed differs") {
    def sig(seed: Long) = Datasets.makeClassification(spark, 200, 4, seed = seed)
      .select(md5(concat_ws(",", col("id"),
        concat_ws(",", transform(col("features"), _.cast("string"))), col("label"))))
      .collect().map(_.getString(0)).sorted.mkString
    assert(sig(42) == sig(42))
    assert(sig(42) != sig(43))
  }

  test("informative features carry signal: fit recovers accuracy > majority") {
    val df = Datasets.makeClassification(spark, nSamples = 2000, nFeatures = 5,
      nInformative = 3, scale = 3.0, chunksize = 500, seed = 1234).cache()
    val m = new LogisticRegression(GlmParams(solver = "lbfgs", maxIter = 50)).fit(df)
    val acc = m.score(df)
    val base = df.select(avg(col("label"))).head().getDouble(0)
    assert(acc > math.max(base, 1 - base) + 0.02, s"acc=$acc base=$base")
    df.unpersist()
  }

  test("make_poisson: non-negative integer labels, mean tracks rate") {
    val df = Datasets.makePoisson(spark, nSamples = 1000, nFeatures = 3,
      chunksize = 250, seed = 5)
    val stats = df.select(min(col("label")), avg(col("label"))).head()
    assert(stats.getDouble(0) >= 0.0)
    assert(df.select(sum((col("label") % 1 =!= 0).cast("int"))).head().getLong(0) == 0)
    val m = new PoissonRegression(GlmParams(solver = "newton", maxIter = 20)).fit(df)
    assert(m.getDeviance(df) >= 0)
  }

  test("make_regression labels are U(0,1) noise (reference quirk)") {
    val df = Datasets.makeRegression(spark, nSamples = 1000, nFeatures = 3, seed = 6)
    val r = df.select(min(col("label")), max(col("label")), avg(col("label"))).head()
    assert(r.getDouble(0) >= 0.0 && r.getDouble(1) <= 1.0)
    assert(math.abs(r.getDouble(2) - 0.5) < 0.05)
  }
}
