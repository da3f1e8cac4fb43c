package graft.ml

import graft.estimators.{GLM, GlmParams, LinearRegression, LogisticRegression, PoissonRegression}
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.param.shared.{HasFeaturesCol, HasLabelCol, HasMaxIter, HasTol}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.{BooleanType, DoubleType, StructType}

/** `spark.ml.Pipeline`-compatible wrapper around the graft estimators —
  * the engine's analog of the reference's sklearn BaseEstimator
  * compatibility (estimators.py:4,19; pipeline/grid-search tests
  * test_estimators.py:138-155). Composes with VectorAssembler etc. since
  * the inner estimators accept both VectorUDT and array<double> features,
  * and with CrossValidator via the Params machinery.
  */
class GraftGlm(override val uid: String)
    extends Estimator[GraftGlmModel]
    with HasFeaturesCol with HasLabelCol with HasMaxIter with HasTol
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graftGlm"))

  final val family: Param[String] = new Param(this, "family",
    "GLM family: logistic | normal | poisson",
    ParamValidators.inArray(Array("logistic", "normal", "poisson")))
  final val solver: Param[String] = new Param(this, "solver",
    "admm | gradient_descent | newton | lbfgs | proximal_grad")
  final val regularizer: Param[String] = new Param(this, "regularizer",
    "l1 | l2 | elastic_net")
  final val lamduh: DoubleParam = new DoubleParam(this, "lamduh", "regularization strength")
  final val fitIntercept: BooleanParam = new BooleanParam(this, "fitIntercept", "")
  // full solver-kwarg surface (estimators.py:39-77 routes **kwargs to the
  // solver) so CrossValidator can grid over ADMM's rho/overRelax/
  // abstol/reltol and the chunk count, like the reference's GridSearchCV
  // analog (test_estimators.py:138-155)
  final val rho: DoubleParam = new DoubleParam(this, "rho",
    "ADMM augmented-Lagrangian penalty", ParamValidators.gt(0.0))
  final val overRelax: DoubleParam = new DoubleParam(this, "overRelax",
    "ADMM over-relaxation factor")
  final val abstol: DoubleParam = new DoubleParam(this, "abstol",
    "ADMM absolute stop tolerance", ParamValidators.gt(0.0))
  final val reltol: DoubleParam = new DoubleParam(this, "reltol",
    "ADMM relative stop tolerance", ParamValidators.gt(0.0))
  final val normalize: BooleanParam = new BooleanParam(this, "normalize",
    "standardize columns before solving (auto-disabled for sparse input)")
  final val nPartitions: IntParam = new IntParam(this, "nPartitions",
    "repartition rows before solving (ADMM chunk count); -1 keeps the scan's")
  final val admmWarmStart: BooleanParam = new BooleanParam(this, "admmWarmStart",
    "warm-start ADMM local solves from the previous iterate")
  final val elasticNetWeight: DoubleParam = new DoubleParam(this,
    "elasticNetWeight", "ElasticNet l1/l2 mixing weight",
    ParamValidators.inRange(0.0, 1.0))

  setDefault(family -> "logistic", solver -> "admm", regularizer -> "l2",
    lamduh -> 1.0, fitIntercept -> true, maxIter -> 100, tol -> 1e-4,
    rho -> 1.0, overRelax -> 1.0, abstol -> 1e-4, reltol -> 1e-2,
    normalize -> true, nPartitions -> -1, admmWarmStart -> false,
    elasticNetWeight -> 0.5,
    featuresCol -> "features", labelCol -> "label")

  def setFamily(v: String): this.type = set(family, v)
  def setSolver(v: String): this.type = set(solver, v)
  def setRegularizer(v: String): this.type = set(regularizer, v)
  def setLamduh(v: Double): this.type = set(lamduh, v)
  def setFitIntercept(v: Boolean): this.type = set(fitIntercept, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  def setTol(v: Double): this.type = set(tol, v)
  def setRho(v: Double): this.type = set(rho, v)
  def setOverRelax(v: Double): this.type = set(overRelax, v)
  def setAbstol(v: Double): this.type = set(abstol, v)
  def setReltol(v: Double): this.type = set(reltol, v)
  def setNormalize(v: Boolean): this.type = set(normalize, v)
  def setNPartitions(v: Int): this.type = set(nPartitions, v)
  def setAdmmWarmStart(v: Boolean): this.type = set(admmWarmStart, v)
  def setElasticNetWeight(v: Double): this.type = set(elasticNetWeight, v)
  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setLabelCol(v: String): this.type = set(labelCol, v)

  private def innerParams = GlmParams(
    fitIntercept = $(fitIntercept), solver = $(solver),
    regularizer = $(regularizer), maxIter = $(maxIter), tol = $(tol),
    lamduh = $(lamduh), rho = $(rho), overRelax = $(overRelax),
    abstol = $(abstol), reltol = $(reltol), normalize = $(normalize),
    nPartitions = $(nPartitions), admmWarmStart = $(admmWarmStart),
    elasticNetWeight = $(elasticNetWeight),
    featuresCol = $(featuresCol), labelCol = $(labelCol))

  override def fit(dataset: Dataset[_]): GraftGlmModel = {
    val inner: GLM = $(family) match {
      case "logistic" => new LogisticRegression(innerParams)
      case "normal" => new LinearRegression(innerParams)
      case "poisson" => new PoissonRegression(innerParams)
    }
    inner.fit(dataset.toDF())
    val model = new GraftGlmModel(uid, inner, $(family))
    copyValues(model).setParent(this)
  }

  override def copy(extra: ParamMap): GraftGlm = defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType =
    // field ORDER must match transform's withColumn order (probability
    // first for logistic) — ordinal-binding consumers read positionally
    if ($(family) == "logistic")
      schema.add("probability", DoubleType).add("prediction", BooleanType)
    else schema.add("prediction", DoubleType)
}

object GraftGlm extends DefaultParamsReadable[GraftGlm]

class GraftGlmModel(
    override val uid: String,
    val inner: GLM,
    val familyName: String)
    extends Model[GraftGlmModel] with MLWritable {

  override def transform(dataset: Dataset[_]): DataFrame =
    inner.transform(dataset.toDF())

  override def copy(extra: ParamMap): GraftGlmModel =
    copyValues(new GraftGlmModel(uid, inner, familyName)).setParent(parent)

  override def transformSchema(schema: StructType): StructType =
    // same order as transform: probability before prediction (logistic)
    if (familyName == "logistic")
      schema.add("probability", DoubleType).add("prediction", BooleanType)
    else schema.add("prediction", DoubleType)

  def coefficients: Array[Double] = inner.coef.toArray
  def intercept: Double = inner.intercept

  /** Model persistence (sklearn-pickle analog, spark.ml idiom): the
    * standard metadata/ + data/ layout — `metadata` carries the spark.ml
    * class-resolution JSON (PipelineModel/CrossValidatorModel persistence
    * loads each stage through `path/metadata`'s className, so a bare
    * parquet file would break fitted-pipeline save/load), `data` one
    * parquet row holding the fitted state: family, the coefficient
    * vector (intercept-last raw form), and the transform-relevant params.
    */
  override def write: MLWriter = new MLWriter {
    override protected def saveImpl(path: String): Unit = {
      // MLWriter.save handles overwrite/exists on `path` BEFORE calling
      // saveImpl — no manual delete here (it could never see an existing
      // path, and duplicating framework behavior would mask a real
      // divergence if the semantics ever changed)
      val spark = sparkSession
      val sc = spark.sparkContext
      val root = new org.apache.hadoop.fs.Path(path)
      val metadata = s"""{"class":"${classOf[GraftGlmModel].getName}",""" +
        s""""timestamp":${System.currentTimeMillis()},""" +
        s""""sparkVersion":"${sc.version}","uid":"$uid",""" +
        s""""paramMap":{},"defaultParamMap":{}}"""
      sc.parallelize(Seq(metadata), 1)
        .saveAsTextFile(new org.apache.hadoop.fs.Path(root, "metadata").toString)
      import spark.implicits._
      Seq((uid, familyName, inner.rawCoef.toArray.toSeq,
          inner.params.fitIntercept, inner.params.featuresCol,
          inner.params.labelCol))
        .toDF("uid", "family", "rawCoef", "fitIntercept", "featuresCol", "labelCol")
        .repartition(1)
        .write.mode("errorifexists")
        .parquet(new org.apache.hadoop.fs.Path(root, "data").toString)
    }
  }
}

object GraftGlmModel extends MLReadable[GraftGlmModel] {
  override def read: MLReader[GraftGlmModel] = new MLReader[GraftGlmModel] {
    override def load(path: String): GraftGlmModel = {
      // standard layout puts the state row under data/; models saved by
      // the pre-metadata writer were a bare parquet dir — read either
      val root = new org.apache.hadoop.fs.Path(path)
      val dataPath = new org.apache.hadoop.fs.Path(root, "data")
      val fs = root.getFileSystem(
        sparkSession.sparkContext.hadoopConfiguration)
      val src = if (fs.exists(dataPath)) dataPath.toString else path
      val row = sparkSession.read.parquet(src).head()
      val params = GlmParams(
        fitIntercept = row.getAs[Boolean]("fitIntercept"),
        featuresCol = row.getAs[String]("featuresCol"),
        labelCol = row.getAs[String]("labelCol"))
      val familyName = row.getAs[String]("family")
      val inner: GLM = familyName match {
        case "logistic" => new LogisticRegression(params)
        case "normal" => new LinearRegression(params)
        case "poisson" => new PoissonRegression(params)
        case other => throw new IllegalArgumentException(
          s"GraftGlmModel.load: unknown family '$other' in model file at $path " +
            "(expected one of: logistic, normal, poisson)")
      }
      inner.rawCoef =
        breeze.linalg.DenseVector(row.getAs[Seq[Double]]("rawCoef").toArray)
      new GraftGlmModel(row.getAs[String]("uid"), inner, familyName)
    }
  }
}
