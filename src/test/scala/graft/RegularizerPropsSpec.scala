package graft

import breeze.linalg.DenseVector
import graft.regularizers.{ElasticNet, L1, L2}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property tests for the regularizer algebra (SURVEY §5:
  * "ScalaCheck where property-like"). The example-based RegularizerSpec
  * ports the reference's fixed cases; these properties pin the algebraic
  * relationships for ALL inputs the generators reach:
  *   - every prox is non-expansive (a convex function's prox is firmly
  *     non-expansive, hence 1-Lipschitz) and shrinks toward 0,
  *   - the L1 prox satisfies the soft-threshold optimality conditions,
  *   - ElasticNet degenerates to L1 at weight=1 and L2 at weight=0,
  *   - gradients match central finite differences of f away from the
  *     L1 kink,
  *   - addRegF/addRegGrad compose as f + λ·reg exactly.
  */
object RegularizerPropsSpec extends Properties("Regularizer") {

  // coordinates bounded away from 0 where a property needs
  // differentiability (L1's gradient/hessian raise near zero by design)
  private val nonzeroCoord: Gen[Double] = for {
    mag <- Gen.choose(0.1, 10.0)
    sgn <- Gen.oneOf(-1.0, 1.0)
  } yield sgn * mag
  private val anyCoord: Gen[Double] = Gen.choose(-10.0, 10.0)

  private def vecGen(coord: Gen[Double]): Gen[DenseVector[Double]] =
    for {
      n <- Gen.choose(1, 8)
      xs <- Gen.listOfN(n, coord)
    } yield DenseVector(xs.toArray)

  private val anyVec = vecGen(anyCoord)
  private val nonzeroVec = vecGen(nonzeroCoord)
  private val stepGen: Gen[Double] = Gen.choose(0.01, 5.0)
  private val weightGen: Gen[Double] = Gen.choose(0.0, 1.0)

  private def maxAbsDiff(a: DenseVector[Double], b: DenseVector[Double]): Double =
    (0 until a.length).map(i => math.abs(a(i) - b(i))).foldLeft(0.0)(math.max)

  private def regs(w: Double) =
    Seq("l1" -> new L1, "l2" -> new L2, s"en($w)" -> new ElasticNet(w))

  property("f is non-negative and zero at the origin") =
    forAll(anyVec, weightGen) { (beta, w) =>
      Prop.all(regs(w).map { case (nm, r) =>
        val zero = DenseVector.zeros[Double](beta.length)
        Prop(r.f(beta) >= 0.0 && r.f(zero) == 0.0) :| nm
      }: _*)
    }

  property("prox is non-expansive (1-Lipschitz in sup norm)") =
    forAll(anyVec, anyVec, stepGen, weightGen) { (x0, y0, t, w) =>
      val n = math.min(x0.length, y0.length)
      val x = x0(0 until n).copy; val y = y0(0 until n).copy
      Prop.all(regs(w).map { case (nm, r) =>
        val d = maxAbsDiff(r.proximalOperator(x, t), r.proximalOperator(y, t))
        Prop(d <= maxAbsDiff(x, y) + 1e-12) :| s"$nm: $d"
      }: _*)
    }

  property("prox shrinks toward 0: |prox(b)_i| <= |b_i|, sign kept or zeroed") =
    forAll(anyVec, stepGen, weightGen) { (beta, t, w) =>
      Prop.all(regs(w).map { case (nm, r) =>
        val p = r.proximalOperator(beta, t)
        Prop((0 until beta.length).forall { i =>
          math.abs(p(i)) <= math.abs(beta(i)) + 1e-12 &&
            (p(i) == 0.0 || math.signum(p(i)) == math.signum(beta(i)))
        }) :| nm
      }: _*)
    }

  property("L1 prox satisfies the soft-threshold optimality conditions") =
    forAll(anyVec, stepGen) { (beta, t) =>
      val p = new L1().proximalOperator(beta, t)
      Prop((0 until beta.length).forall { i =>
        if (p(i) == 0.0) math.abs(beta(i)) <= t + 1e-12
        else math.abs(p(i) - (beta(i) - t * math.signum(p(i)))) <= 1e-12
      })
    }

  property("L2 prox optimality: (prox - b) + t*prox = 0") =
    forAll(anyVec, stepGen) { (beta, t) =>
      val p = new L2().proximalOperator(beta, t)
      Prop((0 until beta.length).forall { i =>
        math.abs((p(i) - beta(i)) + t * p(i)) <= 1e-9
      })
    }

  property("ElasticNet(weight=1) degenerates to L1: f, gradient, prox") =
    forAll(nonzeroVec, stepGen) { (beta, t) =>
      val en = new ElasticNet(1.0); val l1 = new L1
      Prop(math.abs(en.f(beta) - l1.f(beta)) <= 1e-12) &&
        Prop(maxAbsDiff(en.gradient(beta), l1.gradient(beta)) <= 1e-12) &&
        Prop(maxAbsDiff(en.proximalOperator(beta, t),
          l1.proximalOperator(beta, t)) <= 1e-12)
    }

  property("ElasticNet(weight=0) degenerates to L2: f, gradient, prox") =
    forAll(nonzeroVec, stepGen) { (beta, t) =>
      val en = new ElasticNet(0.0); val l2 = new L2
      Prop(math.abs(en.f(beta) - l2.f(beta)) <= 1e-12) &&
        Prop(maxAbsDiff(en.gradient(beta), l2.gradient(beta)) <= 1e-12) &&
        Prop(maxAbsDiff(en.proximalOperator(beta, t),
          l2.proximalOperator(beta, t)) <= 1e-10)
    }

  property("ElasticNet f is the convex combination w*L1 + (1-w)*L2") =
    forAll(anyVec, weightGen) { (beta, w) =>
      val en = new ElasticNet(w)
      val expect = w * new L1().f(beta) + (1 - w) * new L2().f(beta)
      Prop(math.abs(en.f(beta) - expect) <= 1e-10)
    }

  property("gradient matches central finite difference away from the L1 kink") =
    forAll(nonzeroVec, weightGen) { (beta, w) =>
      val eps = 1e-6
      Prop.all(regs(w).map { case (nm, r) =>
        val g = r.gradient(beta)
        Prop((0 until beta.length).forall { i =>
          val bp = beta.copy; bp(i) += eps
          val bm = beta.copy; bm(i) -= eps
          math.abs((r.f(bp) - r.f(bm)) / (2 * eps) - g(i)) <= 1e-4
        }) :| nm
      }: _*)
    }

  property("L1 gradient/hessian raise within np.isclose(0) of a zero coord") =
    forAll(nonzeroVec, Gen.choose(-1e-8, 1e-8)) { (beta0, tiny) =>
      val beta = beta0.copy; beta(0) = tiny
      val l1 = new L1
      Prop(scala.util.Try(l1.gradient(beta)).isFailure) &&
        Prop(scala.util.Try(l1.hessian(beta)).isFailure)
    }

  property("addRegF / addRegGrad compose as f + lambda*reg exactly") =
    forAll(nonzeroVec, Gen.choose(0.0, 10.0), weightGen) { (beta, lam, w) =>
      val fn = (b: DenseVector[Double]) => (b dot b) * 0.5
      val gr = (b: DenseVector[Double]) => b.copy
      Prop.all(regs(w).map { case (nm, r) =>
        val fTot = r.addRegF(fn, lam)(beta)
        val gTot = r.addRegGrad(gr, lam)(beta)
        val gExpect = gr(beta) + r.gradient(beta) * lam
        Prop(math.abs(fTot - (fn(beta) + lam * r.f(beta))) <= 1e-12 &&
          maxAbsDiff(gTot, gExpect) <= 1e-12) :| nm
      }: _*)
    }
}
