package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off timed GLM fit for decade spot-runs (the Bench `glm_fit` row
  * pins median-of-≥5 for round-over-round comparability, which is the
  * wrong harness for a single 600M-row sf100 measurement): same fit
  * config as the bench row, one warm discard + `reps` timed fits,
  * prints per-rep seconds.
  *
  * Run: sbt "runMain graft.examples.GlmFitTimed <sfDir> [reps] [nParts] [ser]"
  *
  * `nParts` (default = cpu count, the bench config) sizes the ADMM
  * chunks: past ~100M rows the per-partition packed matrices outgrow a
  * 32-way split (19M rows × p doubles each), so decade runs pass a
  * larger grid — on a real cluster this is just the executor count. */
object GlmFitTimed {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nParts = if (args.length > 2) args(2).toInt else cpus.toInt
    // "ser" as arg 4 caches rows serialized (GlmParams.serializedCache)
    // — the decade-run regime where the object cache outgrows the heap
    val ser = args.length > 3 && args(3) == "ser"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def fit(): Unit = {
      import graft.estimators.{GlmParams, LogisticRegression}
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val df = li.select(
        array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax"), col("l_linenumber").cast("double")).as("features"),
        (col("l_returnflag") === "R").cast("double").as("label"))
      new LogisticRegression(GlmParams(solver = "admm", maxIter = 20,
        nPartitions = nParts, admmWarmStart = true,
        serializedCache = ser)).fit(df)
    }
    fit() // warm discard (JIT + parquet footers), same rule as Bench
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fit()
      (System.nanoTime() - t0) / 1e9
    }
    println(s"[glm-fit-timed] $sfDir reps=$reps sec=" +
      times.map(t => f"$t%.1f").mkString("[", ", ", "]"))
    spark.stop()
  }
}
