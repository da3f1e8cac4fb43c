package graft.examples

import graft.estimators.{GlmParams, LogisticRegression}
import graft.ops.Sampling
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-based quality filtering, end-to-end with the engine's OWN GLM:
  * train a logistic regression on cheap text statistics and use its
  * probability as a per-document quality score — the classifier-filter
  * pattern of GPT-3's data pipeline (Brown et al. 2020, appendix A: a
  * classifier scores crawl docs against a curated corpus and low-score
  * docs are dropped) and CCNet (Wenzek et al. 2020). This example wires
  * the library's two halves together: the featurizer is pure Spark
  * column algebra (the TextQueries feature family), the fit is graft's
  * ADMM logistic solver, and scoring is a codegen'd column expression
  * ([[graft.estimators.LogisticRegression.predictProbaCol]]) — no
  * driver-side loops anywhere, so the identical job shape scores a
  * 100 TB corpus.
  *
  * The synthetic fixture has no built-in quality signal, so the example
  * CONSTRUCTS its supervision the way real pipelines bootstrap theirs:
  * the positive class is the corpus as-is (the "curated" side) and the
  * negative class is a degraded twin of each training doc (first five
  * tokens boilerplate-repeated — collapsed type-token ratio, the
  * signature of template spam). Train/test assignment uses the keyed
  * [[Sampling.hashSplit]] coin, so the split is reproducible and a
  * degraded twin never leaks into the test fold of its clean original.
  *
  * Run: sbt "runMain graft.examples.QualityClassifier [sfDir]"
  */
object QualityClassifier {

  /** Per-doc quality features from raw text, as one column projection.
    * Tokens are materialized in their OWN projection before any
    * element-wise reads (the jaccardVerify lesson: higher-order
    * functions are interpreted and re-evaluate an inline split per
    * element). Features: type-token ratio, stopword fraction, mean
    * token length, log token count. */
  def featurize(docs: DataFrame, textCol: String): DataFrame = {
    val toks = docs.withColumn("__toks", split(col(textCol), " +"))
      .withColumn("__n", size(col("__toks")).cast("double"))
    toks.withColumn("features", array(
        size(array_distinct(col("__toks"))).cast("double") / col("__n"),
        size(filter(col("__toks"), t => t === "the" || t === "a"))
          .cast("double") / col("__n"),
        length(col(textCol)).cast("double") / col("__n"),
        log1p(col("__n"))))
      .drop("__toks", "__n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-quality-classifier")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // boilerplate degrade: repeat the first five tokens eight times —
    // the template-spam shape (TTR collapses, length homogenizes)
    def degrade(df: DataFrame): DataFrame =
      df.withColumn("text",
        concat_ws(" ", flatten(array_repeat(
          slice(split(col("text"), " +"), 1, 5), 8))))

    // reproducible split on the id coin; label 1 = as-is, 0 = degraded
    val Array(trainRaw, testRaw) =
      Sampling.hashSplit(docs, Array(0.7, 0.3), col("doc_id"), seed = 31L)
    def labeled(df: DataFrame): DataFrame =
      df.withColumn("label", lit(1.0))
        .unionByName(degrade(df).withColumn("label", lit(0.0)))
    val train = featurize(labeled(trainRaw), "text")
      .select("features", "label").persist()
    val test = featurize(labeled(testRaw), "text")
      .select("features", "label").persist()

    val model = new LogisticRegression(GlmParams(
      solver = "admm", regularizer = "l2", lamduh = 0.1)).fit(train)
    println(s"[quality] coef = ${model.coef}, intercept = ${model.intercept}")
    println(f"[quality] train accuracy = ${model.score(train)}%.4f")
    println(f"[quality] test  accuracy = ${model.score(test)}%.4f")

    // score the RAW corpus: probability of "curated-like" as the quality
    // score, thresholded the way the GPT-3 filter drops its tail. The
    // score is a pure column expression over the featurized frame — the
    // filter composes with every other curation op in this package.
    val scored = featurize(docs, "text")
      .withColumn("quality", model.predictProbaCol(col("features")))
    val cut = 0.5
    val kept = scored.filter(col("quality") >= cut)
    println(s"[quality] corpus ${docs.count()} docs -> " +
      s"${kept.count()} above quality cut $cut")

    spark.stop()
  }
}
