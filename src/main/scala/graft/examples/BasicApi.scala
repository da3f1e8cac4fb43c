package graft.examples

import graft.estimators.{GlmParams, LogisticRegression}
import graft.sources.Sources
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable port of the reference's docs/examples/basic_api.ipynb flow:
  * CSV scan → filter → random split → feature assembly → repartition →
  * persist → fit (default admm+l2) → score. The taxi CSV is stood in by
  * lineitem exported to CSV (same shape: numeric features + a derived
  * boolean target).
  *
  * Run: sbt "runMain graft.examples.BasicApi [sfDir]"
  */
object BasicApi {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-basic-api")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage a CSV the way the notebook reads trip.csv
    val csvDir = java.nio.file.Files.createTempDirectory("basic_api_csv").toString
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag")
    Sources.writeCsv(li, csvDir)

    // dd.read_csv → filter → random_split(…, random_state=2)
    val trips = Sources.readCsv(spark, csvDir, li.schema)
      .filter(col("l_quantity") < 45 && col("l_extendedprice") < 80000)
    val Array(train, test) = trips.randomSplit(Array(0.5, 0.5), seed = 2)

    // .values feature assembly + derived boolean target
    def prep(df: org.apache.spark.sql.DataFrame) = df.select(
      array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .as("features"),
      (col("l_returnflag") === "R").cast("double").as("label"))
      .repartition(2)
      .persist()

    val trainDf = prep(train)
    val testDf = prep(test)

    val t0 = System.nanoTime()
    val model = new LogisticRegression(
      GlmParams(fitIntercept = false)).fit(trainDf) // notebook: fit_intercept=False, admm+l2
    val fitSecs = (System.nanoTime() - t0) / 1e9

    println(f"[basic_api] fit wall time: $fitSecs%.1f s (reference notebook: 57.7 s)")
    println(s"[basic_api] coef = ${model.coef}")
    println(f"[basic_api] train accuracy = ${model.score(trainDf)}%.4f")
    println(f"[basic_api] test  accuracy = ${model.score(testDf)}%.4f")
    spark.stop()
  }
}
