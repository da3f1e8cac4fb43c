package graft.families

/** GLM loss families, re-expressed per-row so every distributed reduction
  * is a single pass (`graft.linalg.Kernels`).
  *
  * Reference semantics: /root/reference/dask_glm/families.py
  *  - Logistic.loglike  = Σ(Xβ + log1p(e^{-Xβ})) − y·Xβ   (families.py:14-25)
  *  - Normal.loglike    = Σ(y − Xβ)²  (SSE, unscaled)      (families.py:62-64)
  *  - Poisson.loglike   = Σ(e^{Xβ} − y·Xβ)                 (families.py:96-100)
  * Gradients/hessians are the margin-space derivatives of the same
  * per-row terms; the kernels assemble Xᵀ(dLoss) and Xᵀdiag(d2Loss)X.
  */
sealed trait Family extends Serializable {
  def name: String

  /** Per-row loss contribution at margin `xb` with label `y`. */
  def loss(xb: Double, y: Double): Double

  /** d(loss)/d(margin) — per-row gradient weight. */
  def dLoss(xb: Double, y: Double): Double

  /** d²(loss)/d(margin)² — per-row Hessian weight. */
  def d2Loss(xb: Double, y: Double): Double
}

object Family {
  /** Numerically stable log(1 + e^{-x}) + max(x, 0).
    * The reference's literal `Xbeta + log1p(exp(-Xbeta))` overflows to
    * +Inf for very negative margins (families.py:24-25 tolerates it via
    * IEEE inf arithmetic); the stable two-branch form is algebraically
    * identical and finite everywhere. Parity runs that want the literal
    * overflowing form use [[LogisticUnstable]] explicitly — behavior is
    * intrinsic to the family value, which serializes to executors (a
    * driver-side mutable flag would silently no-op on a real cluster:
    * the object re-initializes per executor JVM). */
  @inline def log1pExpNeg(xb: Double): Double =
    math.max(xb, 0.0) + math.log1p(math.exp(-math.abs(xb)))

  @inline def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  def apply(name: String): Family = name.toLowerCase match {
    case "logistic" => Logistic
    case "normal" | "linear" | "gaussian" => Normal
    case "poisson" => Poisson
    case other => throw new IllegalArgumentException(s"Unknown family: $other")
  }
}

/** Binary-outcome logistic family (families.py:6-51). */
case object Logistic extends Family {
  val name = "logistic"
  @inline def loss(xb: Double, y: Double): Double =
    Family.log1pExpNeg(xb) - y * xb
  @inline def dLoss(xb: Double, y: Double): Double =
    Family.sigmoid(xb) - y
  @inline def d2Loss(xb: Double, y: Double): Double = {
    val s = Family.sigmoid(xb)
    s * (1.0 - s)
  }
}

/** Parity twin of [[Logistic]] with the reference's LITERAL loglike form
  * `xb + log1p(exp(-xb))` (families.py:24-25), which overflows to +Inf
  * for very negative margins exactly as the reference does — for
  * reproducing reference behavior bit-for-bit in parity studies. Not
  * registered in [[Family.apply]]; production code uses [[Logistic]]. */
case object LogisticUnstable extends Family {
  val name = "logistic_unstable"
  @inline def loss(xb: Double, y: Double): Double =
    xb + math.log1p(math.exp(-xb)) - y * xb
  @inline def dLoss(xb: Double, y: Double): Double =
    Family.sigmoid(xb) - y
  @inline def d2Loss(xb: Double, y: Double): Double = {
    val s = Family.sigmoid(xb)
    s * (1.0 - s)
  }
}

/** OLS family; note the reference's unscaled SSE (no ½, no 1/n) —
  * solver step sizes depend on the exact scaling (families.py:62-84). */
case object Normal extends Family {
  val name = "normal"
  @inline def loss(xb: Double, y: Double): Double = {
    val r = y - xb
    r * r
  }
  @inline def dLoss(xb: Double, y: Double): Double = 2.0 * (xb - y)
  @inline def d2Loss(xb: Double, y: Double): Double = 2.0
}

/** Poisson (log-link) family (families.py:87-123). */
case object Poisson extends Family {
  val name = "poisson"
  @inline def loss(xb: Double, y: Double): Double = math.exp(xb) - y * xb
  @inline def dLoss(xb: Double, y: Double): Double = math.exp(xb) - y
  @inline def d2Loss(xb: Double, y: Double): Double = math.exp(xb)
}
