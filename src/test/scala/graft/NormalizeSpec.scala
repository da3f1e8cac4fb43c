package graft

import breeze.linalg.DenseVector
import graft.core.GlmData
import graft.solvers.Normalize
import org.scalatest.funsuite.AnyFunSuite

/** Exact ports of the three `@normalize` branches (test_utils.py:10-51). */
class NormalizeSpec extends AnyFunSuite {
  private def data(rows: Array[Double]*): GlmData = {
    val sc = TestSpark.spark.sparkContext
    new GlmData(
      sc.parallelize(rows.map(r =>
        (org.apache.spark.ml.linalg.Vectors.dense(r): org.apache.spark.ml.linalg.Vector, 0.0)), 1),
      rows.head.length, isSparse = false)
  }
  private val doNothing: GlmData => DenseVector[Double] =
    _ => DenseVector(0.0, 1.0, 2.0)

  test("normalizes with constant (intercept) column") {
    val res = Normalize(data(Array(1.0, 0, 0), Array(1.0, 2, 2)), normalize = true)(doNothing)
    assert(res == DenseVector(-3.0, 1.0, 2.0))
  }

  test("doesn't normalize when disabled") {
    val res = Normalize(data(Array(1.0, 0, 0), Array(1.0, 2, 2)), normalize = false)(doNothing)
    assert(res == DenseVector(0.0, 1.0, 2.0))
  }

  test("scale-only when intercept not present") {
    val res = Normalize(data(Array(1.0, 0, 0), Array(3.0, 9, 2)), normalize = true)(doNothing)
    assert(res == DenseVector(0.0, 1.0 / 4.5, 2.0))
  }

  test("raises on multiple constant columns") {
    assertThrows[IllegalArgumentException] {
      Normalize(data(Array(1.0, 2, 3), Array(1.0, 2, 3)), normalize = true)(doNothing)
    }
  }

  test("add_intercept appends a ones column (utils.py:139-162)") {
    val d = data(Array(0.0, 0, 0), Array(0.0, 0, 0)).addIntercept
    assert(d.numFeatures == 4)
    assert(d.rows.collect().forall { case (x, _) => x.size == 4 && x(3) == 1.0 })
  }
}
