package graft

import graft.ml.GraftGlm
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** spark.ml integration — the analog of the reference's sklearn
  * Pipeline/GridSearchCV compatibility tests (test_estimators.py:138-155)
  * — plus sparse-vector input coverage (estimators.py:82-84 semantics). */
class MlPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("VectorAssembler -> GraftGlm inside an org.apache.spark.ml.Pipeline") {
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        (col("l_returnflag") === "R").cast("double").as("label"))
    val assembler = new VectorAssembler()
      .setInputCols(Array("l_quantity", "l_extendedprice", "l_discount"))
      .setOutputCol("features")
    val glm = new GraftGlm().setSolver("lbfgs").setMaxIter(30)
    val pipeline = new Pipeline().setStages(Array(assembler, glm))
    val model = pipeline.fit(li)
    val out = model.transform(li)
    assert(out.columns.contains("prediction") && out.columns.contains("probability"))
    assert(out.count() == li.count())
    val acc = out.select(avg((col("label").cast("boolean") === col("prediction")).cast("double")))
      .head().getDouble(0)
    assert(acc > 0.5)
  }

  test("ParamMap copy works (CrossValidator prerequisite)") {
    val glm = new GraftGlm().setSolver("newton").setMaxIter(7)
    val copied = glm.copy(org.apache.spark.ml.param.ParamMap.empty)
    assert(copied.getOrDefault(copied.maxIter) == 7)
  }

  test("CrossValidator grid search over lamduh (GridSearchCV analog)") {
    import org.apache.spark.ml.evaluation.RegressionEvaluator
    import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .select(
        org.apache.spark.sql.functions.array(col("l_quantity"), col("l_discount")).as("features"),
        col("l_extendedprice").as("label"))
      .limit(2000)
    val glm = new GraftGlm().setFamily("normal").setSolver("proximal_grad")
      .setRegularizer("l2").setMaxIter(15)
    val grid = new ParamGridBuilder()
      .addGrid(glm.lamduh, Array(0.01, 1.0))
      .build()
    val cv = new CrossValidator()
      .setEstimator(glm)
      .setEvaluator(new RegressionEvaluator().setMetricName("rmse"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(2)
      .setSeed(7)
    val model = cv.fit(li)
    assert(model.avgMetrics.length == 2)
    assert(model.avgMetrics.forall(m => !m.isNaN && m > 0))
  }

  test("CrossValidator sweeps admm rho + elasticNetWeight (full kwarg surface)") {
    // completes the reference's GridSearchCV analog
    // (test_estimators.py:138-155): the solver kwargs routed through
    // **kwargs there (rho, abstol, chunks) must be grid-able here
    import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
    import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .select(
        org.apache.spark.sql.functions.array(col("l_quantity"), col("l_discount")).as("features"),
        (col("l_returnflag") === "R").cast("double").as("label"))
      .limit(2000)
    val glm = new GraftGlm().setFamily("logistic").setSolver("admm")
      .setRegularizer("elastic_net").setMaxIter(10).setLamduh(0.01)
      .setNPartitions(4).setAdmmWarmStart(true).setAbstol(1e-3).setReltol(1e-2)
    val grid = new ParamGridBuilder()
      .addGrid(glm.rho, Array(0.5, 2.0))
      .addGrid(glm.elasticNetWeight, Array(0.2, 0.8))
      .build()
    val cv = new CrossValidator()
      .setEstimator(glm)
      .setEvaluator(new BinaryClassificationEvaluator()
        .setRawPredictionCol("probability"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(2)
      .setSeed(11)
    val model = cv.fit(li)
    assert(model.avgMetrics.length == 4)
    assert(model.avgMetrics.forall(m => !m.isNaN && m > 0.0))
    // the winning rho must actually reach the inner estimator
    val bestEst = model.bestModel.parent.asInstanceOf[GraftGlm]
    assert(Seq(0.5, 2.0).contains(bestEst.getOrDefault(bestEst.rho)))
  }

  test("sparse vector input: fits without densifying, normalize disabled") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (0 until 400).map { i =>
      val idx = Array(0, 1 + rng.nextInt(8)).distinct.sorted
      val vals = idx.map(_ => rng.nextGaussian())
      val v = Vectors.sparse(10, idx, vals)
      val label = if (1.0 / (1.0 + math.exp(-v(0) * 2.0)) > rng.nextDouble()) 1.0 else 0.0
      (v, label)
    }
    val df = rows.toDF("features", "label")
    val data = graft.core.GlmData.fromDF(df)
    assert(data.isSparse)
    val m = new graft.estimators.LogisticRegression(
      graft.estimators.GlmParams(solver = "lbfgs", maxIter = 50)).fit(df)
    assert(m.rawCoef.toArray.forall(v => !v.isNaN && !v.isInfinity))
    val acc = m.score(df)
    assert(acc > 0.5, s"acc=$acc")
  }

  test("sparse and dense input give the same unnormalized fit") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    val rows = (0 until 200).map { i =>
      val dense = Array.tabulate(4)(j => if (rng.nextBoolean()) rng.nextGaussian() else 0.0)
      val label = if (rng.nextDouble() < 0.5) 1.0 else 0.0
      (dense, label)
    }
    val denseDf = rows.map { case (a, l) => (Vectors.dense(a), l) }.toDF("features", "label")
    val sparseDf = rows.map { case (a, l) => (Vectors.dense(a).toSparse: org.apache.spark.ml.linalg.Vector, l) }
      .toDF("features", "label")
    val p = graft.estimators.GlmParams(solver = "newton", maxIter = 20, normalize = false)
    val a = new graft.estimators.LogisticRegression(p).fit(denseDf).rawCoef
    val b = new graft.estimators.LogisticRegression(p).fit(sparseDf).rawCoef
    assert(breeze.linalg.max(breeze.numerics.abs(a - b)) < 1e-10)
  }

  test("admm flat-pack survives mixed dense/sparse VectorUDT rows") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      val dense = Array.tabulate(4)(_ => rng.nextGaussian())
      (dense, if (rng.nextDouble() < 0.5) 1.0 else 0.0)
    }
    val denseDf = rows.map { case (a, l) => (Vectors.dense(a), l) }.toDF("features", "label")
    // first row dense → isSparse inferred false → flat-pack path runs;
    // per-row sparse vectors later in the partition must scatter into the
    // pack, not ClassCastException (VectorAssembler-style mixed input)
    val mixedDf = rows.zipWithIndex.map { case ((a, l), i) =>
      val v: org.apache.spark.ml.linalg.Vector =
        if (i % 3 == 1) Vectors.dense(a).toSparse else Vectors.dense(a)
      (v, l)
    }.toDF("features", "label")
    assert(!graft.core.GlmData.fromDF(mixedDf).isSparse)
    val p = graft.estimators.GlmParams(solver = "admm", maxIter = 10,
      normalize = false, nPartitions = 2)
    val a = new graft.estimators.LogisticRegression(p).fit(denseDf).rawCoef
    val b = new graft.estimators.LogisticRegression(p).fit(mixedDf).rawCoef
    assert(breeze.linalg.max(breeze.numerics.abs(a - b)) < 1e-10)
  }

  test("model load: unknown family fails with a descriptive error") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_badmodel").toString + "/m"
    Seq(("uid1", "bogus", Seq(1.0, 2.0), true, "features", "label"))
      .toDF("uid", "family", "rawCoef", "fitIntercept", "featuresCol", "labelCol")
      .write.parquet(dir)
    val e = intercept[IllegalArgumentException](graft.ml.GraftGlmModel.load(dir))
    assert(e.getMessage.contains("bogus"))
  }

  test("model save/load round-trip: identical predictions") {
    import spark.implicits._
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    val df = li.select(
      array(col("l_quantity"), col("l_discount")).as("features"),
      (col("l_returnflag") === "R").cast("double").as("label"))
    val model = new GraftGlm().setSolver("newton").setMaxIter(10).fit(df)
    val dir = java.nio.file.Files.createTempDirectory("graft_model").toString + "/m"
    model.write.overwrite().save(dir)
    val loaded = graft.ml.GraftGlmModel.load(dir)
    assert(loaded.familyName == model.familyName)
    assert(loaded.coefficients.toSeq == model.coefficients.toSeq)
    assert(loaded.intercept == model.intercept)
    val before = model.transform(df).select("probability")
      .limit(50).collect().map(_.getDouble(0)).toSeq
    val after = loaded.transform(df).select("probability")
      .limit(50).collect().map(_.getDouble(0)).toSeq
    assert(before == after)
    // the estimator itself persists via DefaultParamsWritable
    val edir = java.nio.file.Files.createTempDirectory("graft_est").toString + "/e"
    val est = new GraftGlm().setSolver("lbfgs").setLamduh(0.3)
    est.write.overwrite().save(edir)
    val estLoaded = GraftGlm.load(edir)
    assert(estLoaded.getOrDefault(estLoaded.solver) == "lbfgs")
    assert(estLoaded.getOrDefault(estLoaded.lamduh) == 0.3)
  }

  test("FITTED PipelineModel containing GraftGlmModel saves and loads") {
    // PipelineModel persistence resolves each stage through the stage
    // dir's metadata/ JSON — a bare-parquet model writer breaks exactly
    // this path (the direct GraftGlmModel.load round-trip above passes
    // regardless, so only a full-pipeline test catches it)
    import spark.implicits._
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    val df = li.select(
      array(col("l_quantity"), col("l_discount")).as("features"),
      (col("l_returnflag") === "R").cast("double").as("label"))
    val pipe = new org.apache.spark.ml.Pipeline().setStages(
      Array(new GraftGlm().setSolver("newton").setMaxIter(10)))
    val fitted = pipe.fit(df)
    val dir = java.nio.file.Files.createTempDirectory("graft_pipe").toString + "/p"
    fitted.write.overwrite().save(dir)
    val loaded = org.apache.spark.ml.PipelineModel.load(dir)
    val before = fitted.transform(df).select("probability")
      .limit(50).collect().map(_.getDouble(0)).toSeq
    val after = loaded.transform(df).select("probability")
      .limit(50).collect().map(_.getDouble(0)).toSeq
    assert(before == after)
    // declared output schema matches the real output (field order too)
    val declared = fitted.transformSchema(df.schema).fieldNames.toSeq
    val actual = fitted.transform(df).schema.fieldNames.toSeq
    assert(declared == actual, s"$declared vs $actual")
  }
}
