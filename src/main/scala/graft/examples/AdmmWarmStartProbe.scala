package graft.examples

import graft.core.GlmData
import graft.families.Logistic
import graft.regularizers.Regularizer
import graft.solvers.Solvers
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Warm-start evidence harness (VERDICT r14 #7): the `admmWarmStart`
  * fast path's claimed benefit — "reuses each chunk's previous solution,
  * which cuts the local L-BFGS work sharply once the consensus
  * stabilizes" — measured instead of asserted. Runs the EXACT glm_fit
  * bench shape (sf0.1 lineitem, 5 features + intercept, admm logistic,
  * maxIter=20, 32 partitions) twice per rep — parity default
  * (warmStart=false, the reference's restart-from-ones behavior,
  * algorithms.py:302-312) and warmStart=true — with [[Solvers.AdmmDiag]]
  * reporting consensus iterations and total local L-BFGS objective
  * evaluations, plus the coefficient distance between the two fits
  * (the fast path must land on the same optimum to be usable).
  *
  * Usage: sbt "runMain graft.examples.AdmmWarmStartProbe [sfDir] [reps]"
  * Prints one JSON line; tracked copy goes to docs/artifacts/r15/. */
object AdmmWarmStartProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-admm-warmstart-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val df = li.select(
      array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_linenumber").cast("double")).as("features"),
      (col("l_returnflag") === "R").cast("double").as("label"))
    val base = GlmData.fromDF(df, "features", "label").repartition(32)
    val data = base.addIntercept.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    data.rows.count() // materialize the cache outside every timed region

    def fit(warm: Boolean): (Double, Solvers.AdmmDiag, breeze.linalg.DenseVector[Double]) = {
      val diag = new Solvers.AdmmDiag
      val t0 = System.nanoTime()
      val beta = Solvers.admm(data, Regularizer.get("l1"), lamduh = 0.1,
        maxIter = 20, family = Logistic, normalize = true,
        warmStart = warm, diag = diag)
      ((System.nanoTime() - t0) / 1e9, diag, beta)
    }

    // warmup both paths once (JIT), then interleave timed reps
    fit(warm = false); fit(warm = true)
    val cold = Array.fill(reps)(0.0); val warm = Array.fill(reps)(0.0)
    var coldDiag: Solvers.AdmmDiag = null
    var warmDiag: Solvers.AdmmDiag = null
    var dist = 0.0
    for (r <- 0 until reps) {
      val (tc, dc, bc) = fit(warm = false)
      val (tw, dw, bw) = fit(warm = true)
      cold(r) = tc; warm(r) = tw; coldDiag = dc; warmDiag = dw
      dist = breeze.linalg.norm(bc - bw)
    }
    def med(a: Array[Double]) = a.sorted.apply(a.length / 2)
    def num(v: Double) =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    println(s"""{"shape":"glm_fit sf0.1 admm logistic maxIter=20 np=32",""" +
      s""""reps":$reps,"parity_wall_med_s":${num(med(cold))},""" +
      s""""warm_wall_med_s":${num(med(warm))},""" +
      s""""parity_wall_min_s":${num(cold.min)},"warm_wall_min_s":${num(warm.min)},""" +
      s""""parity_iterations":${coldDiag.iterations},""" +
      s""""warm_iterations":${warmDiag.iterations},""" +
      s""""parity_local_evals":${coldDiag.localEvals},""" +
      s""""warm_local_evals":${warmDiag.localEvals},""" +
      s""""coef_l2_dist":${num(dist)},""" +
      s""""wall_speedup":${num(med(cold) / med(warm))},""" +
      s""""evals_ratio":${num(coldDiag.localEvals.toDouble /
        math.max(1L, warmDiag.localEvals))}}""")
    spark.stop()
  }
}
