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
}
