package graft.examples

import breeze.linalg.{norm, DenseVector}
import graft.core.GlmData
import graft.datasets.Datasets
import graft.families.Logistic
import graft.linalg.Kernels
import graft.solvers.Solvers
import org.apache.spark.sql.SparkSession

/** Runnable port of the reference's docs/examples/AccuracyBook.ipynb:
  * fit the SAME logistic problem with different solvers and check
  * OPTIMALITY directly instead of trusting convergence flags —
  *
  *  1. gradient norms at the solution (Newton lands near machine eps;
  *     gradient descent is visibly looser — the notebook's headline),
  *  2. the intercept moment condition (with an intercept column, the
  *     intercept gradient component is Σσ(xβ) − Σy, so aggregate
  *     predictions must equal the aggregate label count at optimum),
  *  3. the negative log-likelihood of each estimate ("surprisingly
  *     close" even when the gradients differ — the notebook's caveat),
  *  4. the l1 SUBGRADIENT condition for admm vs proximal_grad at λ=4
  *     (β_i = 0 ⇒ |∇_i| ≤ λ; β_i ≠ 0 ⇒ ∇_i + λ·sign(β_i) ≈ 0) — the
  *     notebook's check_regularized_grad, no sklearn needed.
  *
  * Run: sbt "runMain graft.examples.AccuracyBook"
  */
object AccuracyBook {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-accuracy-book")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // N=1000, p=3, 5 chunks — the notebook's setup
    val df = Datasets.makeClassification(spark, nSamples = 1000,
      nFeatures = 3, nInformative = 3, chunksize = 200, seed = 11L)
    val base = GlmData.fromDF(df)
    val data = base.addIntercept.persist()

    // ---- unregularized: newton vs gradient descent, same tol story
    val newtonsBeta = Solvers.newton(data, tol = 1e-8, normalize = false)
    val gdBeta = Solvers.gradientDescent(data, tol = 1e-14, normalize = false)

    def gradOf(b: DenseVector[Double]) = Kernels.grad(data, b, Logistic)
    val (ng, gg) = (gradOf(newtonsBeta), gradOf(gdBeta))
    println("[accuracy] size of gradient (l2 / max-abs)")
    println(f"[accuracy]   newton           : ${norm(ng)}%.2e / ${breeze.linalg.max(breeze.numerics.abs(ng))}%.2e")
    println(f"[accuracy]   gradient descent : ${norm(gg)}%.2e / ${breeze.linalg.max(breeze.numerics.abs(gg))}%.2e")

    // ---- intercept moment condition: the intercept slot (LAST, the
    // engine's layout) of the gradient is Σσ(xβ) − Σy
    val p = data.numFeatures
    println(f"[accuracy] |sum(preds) - sum(y)|: newton ${math.abs(ng(p - 1))}%.2e, gd ${math.abs(gg(p - 1))}%.2e")

    // ---- negative log-likelihood: close even when the gradients are not
    val (nl, gl) = (Kernels.loss(data, newtonsBeta, Logistic),
      Kernels.loss(data, gdBeta, Logistic))
    println(f"[accuracy] negative log-likelihood: newton $nl%.4f, gd $gl%.4f (delta ${math.abs(nl - gl)}%.2e)")

    // ---- l1-regularized at λ=4, NO intercept (the notebook fits
    // fit_intercept=False here): subgradient optimality per coordinate
    val lamduh = 4.0
    val reg = graft.regularizers.Regularizer.get("l1")
    val admmBeta = Solvers.admm(base, reg, lamduh, normalize = false)
    val proxBeta = Solvers.proximalGrad(base, reg, lamduh, tol = 1e-10,
      normalize = false)

    def checkRegularized(name: String, b: DenseVector[Double]): Unit = {
      val g = Kernels.grad(base, b, Logistic)
      val lines = (0 until b.length).map { i =>
        if (b(i) == 0.0) {
          val ok = math.abs(g(i)) <= lamduh + 1e-6
          f"beta($i)=0, |grad|=${math.abs(g(i))}%.4f <= lambda: $ok"
        } else {
          f"beta($i)=${b(i)}%.6f, grad+lambda*sign=${g(i) + lamduh * math.signum(b(i))}%.2e"
        }
      }
      println(s"[accuracy] $name l1 subgradient check:\n[accuracy]   ${lines.mkString("\n[accuracy]   ")}")
    }
    checkRegularized("admm", admmBeta)
    checkRegularized("proximal_grad", proxBeta)

    data.unpersist()
    spark.stop()
  }
}
