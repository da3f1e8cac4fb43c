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

  test("add_intercept on sparse rows stays sparse (test_utils.py:104-129)") {
    // the reference's sparse case: a 4x4 all-zero COO gains a sparse ones
    // column — [0,0,0,0,1] per row, no densify (the reference marks its
    // dask variant xfail on a fill-value clash; the engine supports it)
    import org.apache.spark.ml.linalg.Vectors
    val rows = graft.TestSpark.spark.sparkContext.parallelize(Seq(
      (Vectors.sparse(4, Array(), Array()): org.apache.spark.ml.linalg.Vector, 0.0),
      (Vectors.sparse(4, Array(1), Array(2.0)), 1.0)), 1)
    val d = new graft.core.GlmData(rows, 4, isSparse = true).addIntercept
    assert(d.numFeatures == 5)
    val out = d.rows.collect()
    out.foreach { case (x, _) =>
      assert(x.isInstanceOf[org.apache.spark.ml.linalg.SparseVector], x.getClass)
      assert(x.size == 5 && x(4) == 1.0)
    }
    assert(out(1)._1(1) == 2.0) // existing actives preserved
  }
}
