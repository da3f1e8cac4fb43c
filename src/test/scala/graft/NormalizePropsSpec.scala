package graft

import breeze.linalg.DenseVector
import graft.core.GlmData
import graft.solvers.Normalize
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** The normalize wrapper's defining invariant, property-checked: for ANY
  * coefficient vector the inner solver returns on the standardized data,
  * the un-transformed coefficients produce the SAME margins on the raw
  * data (`X·β' == Xn·β̂` row-wise — utils.py:14-39's algebra, including
  * the constant-column/intercept `i_adj` branch). The example-based
  * NormalizeSpec ports the reference's four fixed cases; this pins the
  * algebra across generated matrices in both branches. */
object NormalizePropsSpec extends Properties("Normalize") {

  // Spark jobs per sample → keep the case count moderate
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = TestSpark.spark

  private case class Fixture(rows: Seq[Array[Double]], betaHat: Array[Double],
      withConstCol: Boolean)

  private val fixtureGen: Gen[Fixture] = for {
    n <- Gen.choose(3, 8)
    p <- Gen.choose(1, 3)
    // vary magnitudes so mean/std are non-trivial; avoid degenerate
    // zero-variance random columns by spreading each column explicitly
    base <- Gen.listOfN(n * p, Gen.choose(-5.0, 5.0))
    spread <- Gen.listOfN(p, Gen.choose(1.0, 4.0))
    withConst <- Gen.oneOf(true, false)
    beta <- Gen.listOfN(p + (if (withConst) 1 else 0), Gen.choose(-2.0, 2.0))
  } yield {
    val rows = (0 until n).map { i =>
      val feat = (0 until p).map { j =>
        base(i * p + j) * spread(j) + i * 0.37 * (j + 1) // guarantees variance
      }
      // the constant column is the ONES intercept column — the i_adj
      // un-transform is the reference's add_intercept contract (a ones
      // column appended by utils.add_intercept), not arbitrary constants
      (if (withConst) feat :+ 1.0 else feat).toArray
    }
    Fixture(rows, beta.toArray, withConst)
  }

  property("un-transformed coefficients reproduce the standardized margins") =
    forAll(fixtureGen) { fx =>
      import spark.implicits._
      val df = fx.rows.map(r => (r.toSeq, 0.0)).toDF("features", "label")
      val data = GlmData.fromDF(df, numFeatures = fx.rows.head.length)
      val betaHat = DenseVector(fx.betaHat)
      // capture the standardized rows the wrapper hands to the solver
      var xnRows: Array[Array[Double]] = null
      val out = Normalize(data, normalize = true) { xn =>
        xnRows = xn.rows.map(_._1.toArray).collect()
        betaHat
      }
      val expected = xnRows.map(r =>
        r.zip(fx.betaHat).map { case (a, b) => a * b }.sum)
      // xn.rows.collect() preserves the parent's partition/row order, so
      // margins align index-wise with the raw rows
      val actual = fx.rows.map(r =>
        r.zip(out.toArray).map { case (a, b) => a * b }.sum)
      val maxErr = expected.zip(actual)
        .map { case (e, a) => math.abs(e - a) }.max
      Prop(maxErr <= 1e-8) :| s"maxErr=$maxErr const=${fx.withConstCol}"
    }

  property("multiple constant columns raise (branch 2)") =
    forAll(Gen.choose(-2.0, 2.0), Gen.choose(-2.0, 2.0)) { (c1, c2) =>
      import spark.implicits._
      val df = Seq.tabulate(4)(i => (Seq(i.toDouble, c1, c2), 0.0))
        .toDF("features", "label")
      val data = GlmData.fromDF(df, numFeatures = 3)
      Prop(scala.util.Try(
        Normalize(data, normalize = true)(_ => DenseVector.zeros[Double](3))
      ).isFailure)
    }
}
