package graft

import breeze.linalg.{norm, DenseVector}
import graft.core.GlmData
import graft.families.Logistic
import graft.solvers.Solvers
import org.apache.spark.ml.linalg.{Vector => MlVector, Vectors}
import org.scalatest.funsuite.AnyFunSuite

/** Port of test_admm.py:12-47 — with a huge ρ the ADMM x-update local
  * solve is pinned to z (the quadratic term dominates the data loss). */
class AdmmLocalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mkData(n: Int, beta: Array[Double], seed: Int): GlmData = {
    val rng = new scala.util.Random(seed)
    val rows = (0 until n).map { _ =>
      val x = Array.fill(beta.length)(rng.nextDouble())
      val y = if (rng.nextDouble() > 0.4) 1.0 else 0.0
      (Vectors.dense(x): MlVector, y)
    }
    new GlmData(spark.sparkContext.parallelize(rows, 1), beta.length, isSparse = false)
  }

  test("local_update with rho=1e7 pins the solution to z (test_admm.py:12-29)") {
    for {
      n <- Seq(1000, 10000)
      beta <- Seq(Array(-1.5, 3.0), Array(35.0, 2.0, 0.0, -3.2),
        Array(-1e-2, 1e-4, 1.0, 2e-3, -1.2))
    } {
      val data = mkData(n, beta, seed = n + beta.length)
      val p = beta.length
      val rng = new scala.util.Random(2)
      val z = DenseVector.fill(p)(rng.nextGaussian())
      val u = Array(DenseVector.zeros[Double](p))
      val init = Array(DenseVector(beta.clone()))
      val result = Solvers.localSolves(data, init, z, u, rho = 1e7, family = Logistic)
      assert(norm(result(0) - z) <= 2e-3,
        s"n=$n p=$p: ||beta_local - z|| = ${norm(result(0) - z)}")
    }
  }

  // ---- maxFun evaluation cap (VERDICT r14 #5): the reference's local
  // solver is fmin_l_bfgs_b(maxiter=200, maxfun=250) — objective
  // EVALUATIONS capped separately from iterations (algorithms.py:345).

  /** A valley objective whose line search evaluates several times per
    * iteration and whose curvature is too ill-conditioned to converge
    * within 250 evals at tol=0 — Rosenbrock in p dims. */
  private def rosenbrock(p: Int) = new breeze.optimize.DiffFunction[DenseVector[Double]] {
    def calculate(x: DenseVector[Double]): (Double, DenseVector[Double]) = {
      var f = 0.0
      val g = DenseVector.zeros[Double](p)
      var i = 0
      while (i < p - 1) {
        val a = x(i + 1) - x(i) * x(i)
        val b = 1.0 - x(i)
        f += 100.0 * a * a + b * b
        g(i) += -400.0 * a * x(i) - 2.0 * b
        g(i + 1) += 200.0 * a
        i += 1
      }
      (f, g)
    }
  }

  test("safeLbfgs caps objective evaluations at maxFun=250 (algorithms.py:345)") {
    val p = 200
    var evals = 0
    val counting = new breeze.optimize.DiffFunction[DenseVector[Double]] {
      private val inner = rosenbrock(p)
      def calculate(x: DenseVector[Double]): (Double, DenseVector[Double]) = {
        evals += 1
        inner.calculate(x)
      }
    }
    // Unbounded control: the same problem at tol=0 runs past 250 evals,
    // so the capped assertion below is non-vacuous.
    val initV = DenseVector.fill(p)(-1.2)
    Solvers.safeLbfgs(counting, initV.copy, maxIter = 10000, tol = 0.0)
    assert(evals > 250, s"control must exceed the cap, ran $evals evals")

    evals = 0
    val res = Solvers.safeLbfgs(counting, initV.copy, maxIter = 10000,
      tol = 0.0, maxFun = 250)
    // scipy stops when the count EXCEEDS maxfun: at most one extra call
    // observes the breach; the result is the last completed iterate.
    assert(evals <= 251, s"capped run evaluated $evals times (> 250+1)")
    assert(res.forall(v => java.lang.Double.isFinite(v)), "iterate must be finite")
    // The cap returns best-so-far, not the init: progress was made.
    assert(rosenbrock(p).valueAt(res) < rosenbrock(p).valueAt(initV))
  }

  test("maxFun cap leaves an easy local solve's answer unchanged") {
    // Well-conditioned quadratic converges in far fewer than 250 evals:
    // capped and uncapped runs must agree bit-for-bit (convergence
    // oracles unchanged — the cap is a ceiling, not a behavior change).
    val p = 5
    val target = DenseVector.tabulate(p)(i => i - 2.0)
    val quad = new breeze.optimize.DiffFunction[DenseVector[Double]] {
      def calculate(x: DenseVector[Double]): (Double, DenseVector[Double]) = {
        val d = x - target
        (0.5 * (d dot d), d)
      }
    }
    val a = Solvers.safeLbfgs(quad, DenseVector.zeros[Double](p), maxIter = 200)
    val b = Solvers.safeLbfgs(quad, DenseVector.zeros[Double](p), maxIter = 200,
      maxFun = 250)
    assert(a === b)
  }
}
