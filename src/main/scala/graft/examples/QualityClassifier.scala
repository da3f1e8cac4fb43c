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

    // fastText-pattern twin (Joulin et al. 2016): hashed unigram+bigram
    // BAG features through the fused HashedNgramCounts kernel (the DSIR
    // feature space accumulated to a dense count vector) into the SAME
    // GLM. The second degradation shows what each featurization is FOR:
    // vocabulary spam (every 3rd token replaced by an injected spam
    // word) barely moves the hand statistics — TTR and lengths stay
    // ordinary — but lights up the spam words' buckets consistently
    // across documents, which is exactly the signal a linear bag model
    // reads. Template spam is the mirror image: it preserves the
    // vocabulary (bag features see ordinary buckets) while collapsing
    // TTR. Each featurization catches the spam it models.
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val spamWords = array(lit("promo"), lit("offer"), lit("deal"),
      lit("sale"), lit("click"))
    def spamify(df: DataFrame): DataFrame =
      df.withColumn("text", concat_ws(" ",
        transform(split(col("text"), " +"),
          (t, i) => when(pmod(i, lit(3)) === 0,
            element_at(spamWords, (pmod(i, lit(5)) + 1).cast("int")))
            .otherwise(t))))
    def labeledSpam(df: DataFrame): DataFrame =
      df.withColumn("label", lit(1.0))
        .unionByName(spamify(df).withColumn("label", lit(0.0)))
    val bagB = 256
    def bagFeaturize(df: DataFrame): DataFrame =
      df.withColumn("features", ColumnBridge.column(
        graft.functions.HashedNgramCounts(
          ColumnBridge.expression(lower(col("text"))), bagB)))
    // normalize=false: most of the 256 buckets are constant zero on a
    // 31-word fixture vocabulary, and the normalizer fails loudly on
    // multiple constant columns (the reference's utils.py contract)
    def fitBag(df: DataFrame) = new LogisticRegression(GlmParams(
      solver = "lbfgs", regularizer = "l2", lamduh = 0.01,
      normalize = false)).fit(df)
    def fitStats(df: DataFrame) = new LogisticRegression(GlmParams(
      solver = "admm", regularizer = "l2", lamduh = 0.1)).fit(df)
    val bagSpamTrain = bagFeaturize(labeledSpam(trainRaw)).select("features", "label").persist()
    val bagSpamTest = bagFeaturize(labeledSpam(testRaw)).select("features", "label").persist()
    val statSpamTest = featurize(labeledSpam(testRaw), "text").select("features", "label")
    val bagSpamModel = fitBag(bagSpamTrain)
    val statSpamModel = fitStats(featurize(labeledSpam(trainRaw), "text")
      .select("features", "label"))
    val bagTemplTest = bagFeaturize(labeled(testRaw)).select("features", "label")
    val bagTemplModel = fitBag(bagFeaturize(labeled(trainRaw))
      .select("features", "label"))
    println(f"[quality] vocabulary spam: bag test accuracy = " +
      f"${bagSpamModel.score(bagSpamTest)}%.4f, hand-stats test accuracy = " +
      f"${statSpamModel.score(statSpamTest)}%.4f")
    println(f"[quality] template spam:   bag test accuracy = " +
      f"${bagTemplModel.score(bagTemplTest)}%.4f, hand-stats test accuracy = " +
      f"${model.score(test)}%.4f")

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
