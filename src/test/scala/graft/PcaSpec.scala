package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PCA shadow projection (Similarity.trainPcaProjection / pcaTopK):
  * recovered directions on data with known principal axes, orthonormal
  * rows, deterministic signs, fail-fast on ragged input, and the
  * recall payoff of a learned shadow over the data-oblivious JL one at
  * equal toDim on anisotropic data. */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("recovers known principal axes, ordered by variance, orthonormal, sign-pinned") {
    // x ~ 3·e0·g1 + 1·e3·g2 + 0.05·noise in 8 dims: top-2 directions
    // must be ±e0 then ±e3 (sign convention makes them +e0, +e3)
    val rnd = new scala.util.Random(3)
    val rows = (0 until 4000).map { i =>
      val v = Array.fill(8)(rnd.nextGaussian() * 0.05)
      v(0) += 3.0 * rnd.nextGaussian()
      v(3) += 1.0 * rnd.nextGaussian()
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("id", "vec").repartition(7)
    val rot = Similarity.trainPcaProjection(df, "vec", dim = 8, toDim = 2)
    assert(rot.length == 2 && rot.forall(_.length == 8))
    // first component ≈ e0, second ≈ e3, both with POSITIVE dominant coord
    assert(math.abs(rot(0)(0)) > 0.99 && rot(0)(0) > 0, rot(0).mkString(","))
    assert(math.abs(rot(1)(3)) > 0.99 && rot(1)(3) > 0, rot(1).mkString(","))
    // orthonormal rows
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(rot(0), rot(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(rot(1), rot(1)) - 1.0) < 1e-9)
    assert(math.abs(dot(rot(0), rot(1))) < 1e-9)
    // same data, same partitioning => same rotation (eigSym + sign pin)
    val rot2 = Similarity.trainPcaProjection(df, "vec", dim = 8, toDim = 2)
    assert(rot.flatten.toSeq == rot2.flatten.toSeq)
  }

  test("center=true removes a constant offset from the learned directions") {
    val rnd = new scala.util.Random(5)
    // all mass at mean 10·e1; true variance lives on e2
    val rows = (0 until 2000).map { i =>
      val v = Array.fill(4)(rnd.nextGaussian() * 0.01)
      v(1) += 10.0
      v(2) += rnd.nextGaussian()
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("id", "vec")
    val uncentered = Similarity.trainPcaProjection(df, "vec", 4, 1)
    val centered = Similarity.trainPcaProjection(df, "vec", 4, 1, center = true)
    // raw second moments are dominated by the mean direction e1;
    // centered PCA sees through it to e2
    assert(math.abs(uncentered(0)(1)) > 0.99)
    assert(math.abs(centered(0)(2)) > 0.99)
  }

  test("fail-fast on ragged or null vectors; validation on dims") {
    val bad = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(1.0, 2.0, 3.0))).toDF("id", "vec")
    val e = intercept[org.apache.spark.SparkException] {
      Similarity.trainPcaProjection(bad, "vec", 2, 1)
    }
    assert(e.getMessage.contains("trainPcaProjection") ||
      e.getCause.getMessage.contains("trainPcaProjection"))
    intercept[IllegalArgumentException] {
      Similarity.trainPcaProjection(bad.limit(1), "vec", 2, 3)
    }
  }

  test("learned shadow beats the JL shadow at equal toDim on anisotropic clusters") {
    // 75 small clusters (4 members each) whose centers live in a random
    // 6-dim subspace of 64 dims: the exact top-3 of a query are its 3
    // cluster-mates, so recall is decided by CLUSTER separation — the
    // structure a shadow can preserve. (A shadow can never micro-rank
    // members WITHIN a cluster: that order is decided by off-subspace
    // noise, which any subspace projection — PCA by design — discards.
    // The first draft of this test measured exactly that and failed.)
    // A PCA-6 shadow recovers the 6-dim subspace, keeping the center
    // geometry exact; a JL-6 shadow distorts pairwise cosines by
    // ε ≈ √(ln n / 6), enough to interleave crowded clusters.
    val rnd = new scala.util.Random(17)
    val basis = Array.fill(6)(Array.fill(64)(rnd.nextGaussian()))
    def center(): Array[Double] = {
      val w = Array.fill(6)(rnd.nextGaussian())
      val v = new Array[Double](64)
      for (b <- 0 until 6; d <- 0 until 64) v(d) += w(b) * basis(b)(d)
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(75)(center())
    val rows = for (i <- 0 until 300) yield {
      val c = centers(i % 75)
      (i.toLong, c.map(_ + rnd.nextGaussian() * 0.01).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id") < 10)
    val corpus = df.filter(col("vec_id") >= 10)
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.select("q_id", "c_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", k = 3))
    val rot = Similarity.trainPcaProjection(corpus, "embedding", 64, 6)
    val pca = pairs(Similarity.pcaTopK(corpus, queries, "vec_id", "embedding",
      rot, k = 3, mult = 4))
    val jl = pairs(Similarity.jlTopK(corpus, queries, "vec_id", "embedding",
      fromDim = 64, toDim = 6, k = 3, mult = 4, seed = Some(42L)))
    val pcaRecall = (exact intersect pca).size.toDouble / exact.size
    val jlRecall = (exact intersect jl).size.toDouble / exact.size
    assert(pcaRecall >= 0.9, s"pca recall $pcaRecall")
    assert(pcaRecall >= jlRecall, s"pca $pcaRecall < jl $jlRecall")
    // contract shape: k rows per query
    val perQ = Similarity.pcaTopK(corpus, queries, "vec_id", "embedding",
      rot, k = 3, mult = 4).groupBy("q_id").count().collect().map(_.getLong(1))
    assert(perQ.length == 10 && perQ.forall(_ == 3))
  }
}
