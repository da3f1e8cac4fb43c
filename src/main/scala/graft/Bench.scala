package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline (bench-flagged) queries against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A GLM fit benchmark is
  * included as `glm_fit` — the reference's headline number (BASELINE.md:
  * 57.7 s admm logistic fit at ~6×10⁵ rows) maps to the same row count
  * at sf0.1. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      // the dedup paths persist their band frames (keyed by plan in the
      // cache manager), so a second rep of the same query would read the
      // first rep's cache and time only the warm path — clear between
      // samples so every rep pays the full cost it claims to measure
      spark.sharedState.cacheManager.clearCache()
      // settle before starting the clock: collect the PREVIOUS sample's
      // garbage now so a heavy neighbor (q87's propagation rounds, q80's
      // band frames) doesn't bill its young-gen debt to this sample — r5
      // showed 3-5x phantom "regressions" on sub-second queries that an
      // isolated re-run didn't reproduce (cross-query JVM contamination,
      // not code). GC time is deliberately OUTSIDE the timed region.
      System.gc()
      Thread.sleep(100)
      val t0 = System.nanoTime()
      // a failing query must FAIL the bench (non-zero exit, no JSON), not
      // record its elapsed-to-failure as a timing — a swallowed error
      // here reads as a speedup in the round-over-round comparison
      f
      (System.nanoTime() - t0) / 1e9
    }

    // Median-of-N plus min: the median absorbs one bad sample; the min is
    // the contamination-free floor (closest to what an isolated run
    // measures), reported separately so a verdict can tell "this query
    // got slower" from "its neighbors got noisier".
    def timeStats(reps: Int)(f: => Unit): (Double, Double) = {
      require(reps >= 1, s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $reps")
      val samples = Array.fill(reps)(time(f)).sorted
      (samples(reps / 2), samples(0))
    }

    // SPARK_GRAFT_BENCH_ONLY=q87,q80 restricts the run to the named
    // prefixes (local iteration on one hot query); unset = full set
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val headline = graft.queries.Queries.all.filter(_.bench)
      .filter(q => only.forall(_.exists(q.name.startsWith)))
    // JIT/codegen warmup on the smallest SF (different data dir, so no
    // page-cache advantage for the timed runs), then touch the timed dir's
    // parquet footers once
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      headline.foreach { q =>
        try q.spark(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    // touch EVERY table the headline set scans (not just lineitem) so
    // first-open parquet footer/metadata reads never land in a timed rep
    for (t <- Seq("lineitem", "documents", "embeddings", "events",
        "orders", "customer", "nation", "region", "supplier", "part"))
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () } // optional table absent at this SF

    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val mins = scala.collection.mutable.LinkedHashMap[String, Double]()
    headline.foreach { q =>
      val (med, mn) = timeStats(reps) {
        q.spark(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      results(q.name) = med
      mins(q.name) = mn
    }

    // GLM fit benchmark: the baseline-comparable fit (admm logistic,
    // ~6×10⁵ rows at sf0.1, 5 features + intercept). Median-of-5 (vs 3
    // elsewhere): this is the headline number against BASELINE.md and
    // drifted ±7% round-over-round on unchanged code — two extra samples
    // tighten the median enough to tell real regressions from noise.
    val (fitMed, fitMin) = timeStats(math.max(reps, 5)) {
      import graft.estimators.{GlmParams, LogisticRegression}
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val df = li.select(
        array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax"), col("l_linenumber").cast("double")).as("features"),
        (col("l_returnflag") === "R").cast("double").as("label"))
      new LogisticRegression(GlmParams(solver = "admm", maxIter = 20,
        nPartitions = cpus.toInt, admmWarmStart = true)).fit(df)
    }
    results("glm_fit") = fitMed
    mins("glm_fit") = fitMin

    // Locale.ROOT: the f-interpolator is locale-sensitive — a
    // comma-decimal JVM locale would print invalid JSON
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jmap(m: scala.collection.Map[String, Double]): String =
      m.map { case (k, v) => "\"" + k + "\":" + num(v) }.mkString("{", ",", "}")
    val total = results.values.sum
    println(s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":${jmap(results)},"queries_min":${jmap(mins)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
