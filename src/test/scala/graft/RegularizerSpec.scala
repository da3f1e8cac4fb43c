package graft

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.regularizers._
import org.scalatest.funsuite.AnyFunSuite

/** Exact-value ports of test_regularizers.py:55-185. */
class RegularizerSpec extends AnyFunSuite {
  private def dv(xs: Double*) = DenseVector(xs.toArray)

  test("l2 function") {
    assert(new L2().f(dv(0, 0, 0)) == 0)
    assert(new L2().f(dv(1, 2, 3)) == 7)
  }
  test("l2 gradient/hessian") {
    assert(new L2().gradient(dv(1, 2, 3)) == dv(1, 2, 3))
    assert(new L2().hessian(dv(1, 2, 3)) == DenseMatrix.eye[Double](3))
  }
  test("l2 proximal operator") {
    assert(new L2().proximalOperator(dv(0, 0, 0), 1) == dv(0, 0, 0))
    assert(new L2().proximalOperator(dv(1, 2, 3), 1) == dv(0.5, 1, 1.5))
  }

  test("l1 function") {
    assert(new L1().f(dv(0, 0, 0)) == 0)
    assert(new L1().f(dv(-1, 2, 3)) == 6)
  }
  test("l1 gradient") {
    assert(new L1().gradient(dv(1, 2, 3)) == dv(1, 1, 1))
    assert(new L1().gradient(dv(-1, 2, 3)) == dv(-1, 1, 1))
  }
  test("l1 gradient raises near zero") {
    for (b <- Seq(dv(0.00000001, 1, 2), dv(-0.00000001, 1, 2), dv(0, 0, 0)))
      assertThrows[IllegalArgumentException](new L1().gradient(b))
  }
  test("l1 hessian") {
    assert(new L1().hessian(dv(1, 2)) == DenseMatrix.zeros[Double](2, 2))
    assertThrows[IllegalArgumentException](new L1().hessian(dv(0, 0, 0)))
  }
  test("l1 proximal operator = soft threshold") {
    assert(new L1().proximalOperator(dv(0, 0, 0), 1) == dv(0, 0, 0))
    assert(new L1().proximalOperator(dv(1, 2, 3), 1) == dv(0, 1, 2))
  }

  test("elastic net function") {
    assert(new ElasticNet().f(dv(0, 0, 0)) == 0)
    assert(new ElasticNet().f(dv(1, 2, 3)) == 6.5)
    assert(new ElasticNet(weight = 0).f(dv(1, 2, 3)) == new L2().f(dv(1, 2, 3)))
    assert(new ElasticNet(weight = 1).f(dv(1, 2, 3)) == new L1().f(dv(1, 2, 3)))
  }
  test("elastic net gradient") {
    assert(new ElasticNet(0.5).gradient(dv(1, 2, 3)) == dv(1, 1.5, 2))
  }
  test("elastic net hessian") {
    assert(new ElasticNet(0.5).hessian(dv(1, 2, 3)) == DenseMatrix.eye[Double](3) * 0.5)
    assertThrows[IllegalArgumentException](new ElasticNet(0.5).hessian(dv(0, 1, 2)))
  }
  test("elastic net proximal operator: faithful mode reproduces the identity bug") {
    assert(new ElasticNet(0.5, faithfulProx = true).proximalOperator(dv(1, 2, 3), 1) == dv(1, 2, 3))
  }
  test("elastic net proximal operator: default mode soft-thresholds correctly") {
    // w=0.5, t=1 → g=0.5; prox(b) = (b − 0.5·sign(b)) / (1 − 0.5 + 1)
    val got = new ElasticNet(0.5).proximalOperator(dv(0.25, 2, 3), 1)
    assert(got(0) == 0.0)
    assert(math.abs(got(1) - 1.5 / 1.5) < 1e-12)
    assert(math.abs(got(2) - 2.5 / 1.5) < 1e-12)
  }
  test("add_reg composition f + λ·reg") {
    val l2 = new L2()
    val f = l2.addRegF(b => b dot b, 2.0)
    // f([1,2]) = 5 + 2·(5/2) = 10
    assert(f(dv(1, 2)) == 10.0)
  }
  test("registry") {
    assert(Regularizer.get("l1").name == "l1")
    assert(Regularizer.get("l2").name == "l2")
    assert(Regularizer.get("elastic_net").name == "elastic_net")
    assertThrows[IllegalArgumentException](Regularizer.get("foo"))
  }
}
