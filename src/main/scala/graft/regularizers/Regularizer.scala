package graft.regularizers

import breeze.linalg.{DenseMatrix, DenseVector}

/** Driver-local regularizers on β-sized vectors — pure Breeze, no
  * distribution needed (the reference keeps these on numpy too).
  *
  * Reference: /root/reference/dask_glm/regularizers.py:6-227.
  */
trait Regularizer extends Serializable {
  def name: String
  def f(beta: DenseVector[Double]): Double
  def gradient(beta: DenseVector[Double]): DenseVector[Double]
  def hessian(beta: DenseVector[Double]): DenseMatrix[Double]
  def proximalOperator(beta: DenseVector[Double], t: Double): DenseVector[Double]

  /** Closure composition `f + λ·reg` (regularizers.py:68-129). */
  def addRegF(fn: DenseVector[Double] => Double, lam: Double): DenseVector[Double] => Double =
    beta => fn(beta) + lam * f(beta)
  def addRegGrad(
      grad: DenseVector[Double] => DenseVector[Double],
      lam: Double): DenseVector[Double] => DenseVector[Double] =
    beta => grad(beta) + gradient(beta) * lam
  def addRegHessian(
      hess: DenseVector[Double] => DenseMatrix[Double],
      lam: Double): DenseVector[Double] => DenseMatrix[Double] =
    beta => hess(beta) + hessian(beta) * lam
}

object Regularizer {
  /** Mirror of `np.isclose(x, 0)` default tolerances (atol=1e-8, rtol=1e-5):
    * against zero this reduces to |x| <= 1e-8. */
  @inline private[regularizers] def isCloseToZero(x: Double): Boolean =
    math.abs(x) <= 1e-8

  /** Name → instance registry (regularizers.py:131-150). */
  def get(nameOrNull: String): Regularizer = nameOrNull match {
    case "l1" => new L1
    case "l2" => new L2
    case "elastic_net" => new ElasticNet()
    case other => throw new IllegalArgumentException(s"Not a valid regularizer: $other")
  }
  def get(r: Regularizer): Regularizer = r
}

/** L2: ‖β‖²/2 (regularizers.py:153-168). */
class L2 extends Regularizer {
  val name = "l2"
  def f(beta: DenseVector[Double]): Double = (beta dot beta) / 2.0
  def gradient(beta: DenseVector[Double]): DenseVector[Double] = beta.copy
  def hessian(beta: DenseVector[Double]): DenseMatrix[Double] =
    DenseMatrix.eye[Double](beta.length)
  def proximalOperator(beta: DenseVector[Double], t: Double): DenseVector[Double] =
    beta * (1.0 / (1.0 + t))
}

/** L1: ‖β‖₁ with the reference's raise-near-zero derivative semantics
  * (regularizers.py:176-192). */
class L1 extends Regularizer {
  val name = "l1"
  def f(beta: DenseVector[Double]): Double = breeze.linalg.sum(breeze.numerics.abs(beta))
  def gradient(beta: DenseVector[Double]): DenseVector[Double] = {
    if (beta.valuesIterator.exists(Regularizer.isCloseToZero))
      throw new IllegalArgumentException("l1 norm is not differentiable at 0!")
    beta.map(math.signum)
  }
  def hessian(beta: DenseVector[Double]): DenseMatrix[Double] = {
    if (beta.valuesIterator.exists(Regularizer.isCloseToZero))
      throw new IllegalArgumentException("l1 norm is not twice differentiable at 0!")
    DenseMatrix.zeros[Double](beta.length, beta.length)
  }
  /** Soft threshold: max(0, β−t) − max(0, −β−t). */
  def proximalOperator(beta: DenseVector[Double], t: Double): DenseVector[Double] =
    beta.map(b => math.max(0.0, b - t) - math.max(0.0, -b - t))
}

/** Elastic net: w·L1 + (1−w)·L2 (regularizers.py:195-227).
  *
  * The reference's `proximal_operator` builds a vectorized soft-threshold
  * closure but returns `beta` unchanged — an identity no-op bug its own
  * unit test asserts (test_regularizers.py:183-185). We implement the
  * CORRECT scaled soft-threshold by default; `faithfulProx = true`
  * reproduces the reference's identity behavior for parity runs.
  */
class ElasticNet(val weight: Double = 0.5, val faithfulProx: Boolean = false)
    extends Regularizer {
  val name = "elastic_net"
  private val l1 = new L1
  private val l2 = new L2
  private def weighted(a: Double, b: Double): Double = weight * a + (1 - weight) * b

  def f(beta: DenseVector[Double]): Double = weighted(l1.f(beta), l2.f(beta))
  def gradient(beta: DenseVector[Double]): DenseVector[Double] =
    l1.gradient(beta) * weight + l2.gradient(beta) * (1 - weight)
  def hessian(beta: DenseVector[Double]): DenseMatrix[Double] =
    l1.hessian(beta) * weight + l2.hessian(beta) * (1 - weight)
  def proximalOperator(beta: DenseVector[Double], t: Double): DenseVector[Double] = {
    if (faithfulProx) return beta.copy
    val g = weight * t
    beta.map { b =>
      if (math.abs(b) <= g) 0.0
      else (b - g * math.signum(b)) / (t - g + 1.0)
    }
  }
}
