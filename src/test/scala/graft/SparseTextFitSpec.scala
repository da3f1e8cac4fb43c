package graft

import graft.core.GlmData
import graft.datasets.Datasets
import graft.estimators.{GlmParams, LogisticRegression}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The wide-sparse fit shape (reference estimators.py:82-84: sparse.COO
  * rides the same solvers) at production TEXT width: hashed bag-of-words
  * (p = 8192 murmur3 buckets) over the documents fixture, p ≫ n, rows
  * O(nnz) — the regime the `glm_fit_sparse` bench row times. Pins that
  * (1) the sparse dispatch actually engages end-to-end, (2) the fit is
  * statistically sound (logistic first-order moment condition), and
  * (3) the whole path is deterministic. */
class SparseTextFitSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def labeled = {
    // label = "does the doc contain the token `query`" — a TEXT-derived
    // target (the fixture's lang/source columns are independent of the
    // text, so nothing can beat their majority rate). The fit must find
    // the marker's one hash bucket among 8192 — sparse recovery in its
    // purest form, resolvable to ~perfect accuracy modulo hash
    // collisions on that bucket.
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    Datasets.hashedBow(docs, "text", numFeatures = 8192)
      .select(col("features"),
        array_contains(split(col("text"), " +"), "query")
          .cast("double").as("label"))
  }

  test("hashedBow emits SPARSE rows and GlmData engages the sparse dispatch") {
    val df = labeled
    val data = GlmData.fromDF(df)
    assert(data.isSparse,
      "hashedBow features must arrive as SparseVector rows — a densified " +
        "path would make the glm_fit_sparse bench row measure the wrong kernel")
    assert(data.numFeatures == 8192)
    // rows stay O(nnz): no document has anywhere near p active terms
    val maxNnz = data.rows.map(_._1.numActives).max()
    assert(maxNnz < 1000, s"max nnz $maxNnz suspiciously close to p=8192")
  }

  test("wide-sparse lbfgs fit: moment condition + determinism at p=8192 >> n=500") {
    val df = labeled.persist()
    def fit() = new LogisticRegression(GlmParams(solver = "lbfgs",
      regularizer = "l2", lamduh = 0.01, maxIter = 200,
      normalize = false)).fit(df)
    val model = fit()
    // logistic first-order condition on the intercept coordinate:
    // Σσ(xβ̂) = Σy at the optimum, shifted only by the L2 pull on the
    // intercept (λ·|β₀|, ≪ 1 at λ=0.01) — the same oracle the
    // reference's own test suite uses (test_algos_families.py:54-69),
    // here on a REAL sparse text design matrix instead of dense gaussians
    val agg = model.transform(df)
      .agg(sum(col("probability")).as("p"), sum(col("label")).as("y"))
      .head()
    val gap = math.abs(agg.getDouble(0) - agg.getDouble(1))
    assert(gap <= 2.0, s"moment gap $gap on the sparse text fit")
    // the fit must actually separate languages better than the base rate
    val acc = model.score(df)
    val baseRate = df.agg(avg(col("label"))).head().getDouble(0)
    val majority = math.max(baseRate, 1.0 - baseRate)
    assert(acc > majority + 0.05,
      f"sparse fit accuracy $acc%.3f no better than majority $majority%.3f")
    // determinism: a second fit lands on bit-identical coefficients
    val again = fit()
    assert(model.rawCoef == again.rawCoef,
      "sparse lbfgs fit is nondeterministic across runs")
    df.unpersist()
  }
}
