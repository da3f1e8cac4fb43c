package graft

import graft.families.{Family, Logistic, Normal, Poisson}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the per-row family calculus: dLoss is the
  * margin-derivative of loss, d2Loss the derivative of dLoss (central
  * finite differences), plus the analytic identities the solvers lean on
  * (convexity weights >= 0, the stable loglike ≡ the reference's literal
  * form wherever the literal form is finite, sigmoid symmetry). */
object FamilyPropsSpec extends Properties("Family") {

  // margins where exp/FD stay well-conditioned
  private val marginGen: Gen[Double] = Gen.choose(-8.0, 8.0)
  private val binaryY: Gen[Double] = Gen.oneOf(0.0, 1.0)
  private val realY: Gen[Double] = Gen.choose(-10.0, 10.0)
  private val countY: Gen[Double] = Gen.choose(0, 20).map(_.toDouble)

  private def fams: Seq[(String, Family, Gen[Double])] =
    Seq(("logistic", Logistic, binaryY), ("normal", Normal, realY),
      ("poisson", Poisson, countY))

  property("dLoss is d(loss)/d(margin): central finite difference") =
    forAll(marginGen) { xb =>
      Prop.all(fams.map { case (nm, f, yGen) =>
        forAll(yGen) { y =>
          val eps = 1e-6
          val fd = (f.loss(xb + eps, y) - f.loss(xb - eps, y)) / (2 * eps)
          // exp-family magnitudes reach ~e^8, so compare relative
          val scale = math.max(1.0, math.abs(f.dLoss(xb, y)))
          Prop(math.abs(fd - f.dLoss(xb, y)) <= 1e-4 * scale) :| s"$nm xb=$xb y=$y"
        }
      }: _*)
    }

  property("d2Loss is d(dLoss)/d(margin): central finite difference") =
    forAll(marginGen) { xb =>
      Prop.all(fams.map { case (nm, f, yGen) =>
        forAll(yGen) { y =>
          val eps = 1e-6
          val fd = (f.dLoss(xb + eps, y) - f.dLoss(xb - eps, y)) / (2 * eps)
          val scale = math.max(1.0, math.abs(f.d2Loss(xb, y)))
          Prop(math.abs(fd - f.d2Loss(xb, y)) <= 1e-4 * scale) :| s"$nm xb=$xb y=$y"
        }
      }: _*)
    }

  property("curvature weights are non-negative (convex in the margin)") =
    forAll(marginGen, binaryY) { (xb, y) =>
      Prop.all(fams.map { case (nm, f, _) =>
        Prop(f.d2Loss(xb, y) >= 0.0) :| nm
      }: _*)
    }

  property("stable loglike == reference literal form where the literal is finite") =
    forAll(Gen.choose(-30.0, 700.0)) { xb => // literal overflows below ~-709
      val stable = Family.log1pExpNeg(xb)
      val literal = xb + math.log1p(math.exp(-xb))
      Prop(!java.lang.Double.isFinite(literal) ||
        math.abs(stable - literal) <= 1e-9 * math.max(1.0, math.abs(literal)))
    }

  property("stable loglike stays finite at extreme margins") =
    forAll(Gen.oneOf(Gen.choose(-1e8, -1e3), Gen.choose(1e3, 1e8))) { xb =>
      Prop(java.lang.Double.isFinite(Family.log1pExpNeg(xb)))
    }

  property("sigmoid: in (0,1), symmetric, matches logistic dLoss at y=0") =
    forAll(marginGen) { xb =>
      val s = Family.sigmoid(xb)
      Prop(s > 0.0 && s < 1.0) &&
        Prop(math.abs(Family.sigmoid(-xb) - (1.0 - s)) <= 1e-15) &&
        Prop(Logistic.dLoss(xb, 0.0) == s)
    }

  property("logistic loss is non-negative for binary labels, zero only in the limit") =
    forAll(marginGen, binaryY) { (xb, y) =>
      Prop(Logistic.loss(xb, y) >= 0.0)
    }
}
