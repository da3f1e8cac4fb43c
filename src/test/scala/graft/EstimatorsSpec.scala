package graft

import graft.estimators._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** API/integration smoke over the driver testdata (test_estimators.py
  * analog + FIXTURES.md §3 canonical fixture). */
class EstimatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def lineitemGlm = {
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    li.select(
      array(col("l_quantity"), col("l_extendedprice"), col("l_discount")).as("features"),
      (col("l_returnflag") === "R").cast("double").as("label"))
  }

  test("logistic gd fit/predict/score on lineitem sf0.001") {
    val df = lineitemGlm.cache()
    val m = new LogisticRegression(GlmParams(solver = "gradient_descent", maxIter = 50))
    m.fit(df)
    assert(m.rawCoef.length == 4) // 3 features + intercept (last)
    val acc = m.score(df)
    val base = df.select(avg(col("label"))).head().getDouble(0)
    assert(acc >= math.max(base, 1 - base) - 0.05, s"acc=$acc base=$base")
    val out = m.transform(df)
    assert(out.columns.contains("probability") && out.columns.contains("prediction"))
    df.unpersist()
  }

  test("fitted model serves a STREAM: transform is a stateless projection") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // fit on batch, score a micro-batch stream — predictCol/marginCol
    // are pure Column expressions over the features array (no UDF, no
    // state), so model serving composes with Structured Streaming as-is
    val df = lineitemGlm.limit(500).cache()
    val m = new LogisticRegression(GlmParams(solver = "lbfgs", maxIter = 30))
    m.fit(df)
    val rows = df.select(col("features"), col("label"))
      .as[(Seq[Double], Double)].collect().toSeq
    val batch = m.transform(df)
      .select(col("features"), col("probability"))
      .as[(Seq[Double], Double)].collect().toMap
    val input = MemoryStream[(Seq[Double], Double)]
    val q = m.transform(input.toDF().toDF("features", "label"))
      .select(col("features"), col("probability"))
      .writeStream.outputMode("append").format("memory")
      .queryName("glm_stream_out").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("glm_stream_out")
        .as[(Seq[Double], Double)].collect().toMap
      assert(streamed.keySet == batch.keySet)
      assert(streamed.forall { case (k, p) => p == batch(k) },
        "streamed probabilities must be bit-equal to batch transform")
    } finally { q.stop(); df.unpersist() }
  }

  test("logistic admm (default solver) fits") {
    val df = lineitemGlm
    val m = new LogisticRegression(GlmParams(maxIter = 20))
    m.fit(df)
    val acc = m.score(df)
    assert(acc > 0.5)
  }

  test("linear regression score is MSE (not R2)") {
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    val df = li.select(
      array(col("l_quantity"), col("l_discount")).as("features"),
      col("l_extendedprice").as("label"))
    val m = new LinearRegression(GlmParams(solver = "newton", maxIter = 50))
    m.fit(df)
    val mse = m.score(df)
    val varLabel = df.select(variance(col("label"))).head().getDouble(0)
    assert(mse >= 0 && mse < varLabel) // better than predicting nothing
  }

  test("poisson regression predict is exp(margin); deviance finite") {
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    val df = li.select(
      array(col("l_discount"), col("l_tax")).as("features"),
      col("l_quantity").as("label"))
    val m = new PoissonRegression(GlmParams(solver = "newton", maxIter = 20))
    m.fit(df)
    val dev = m.getDeviance(df)
    assert(!dev.isNaN && dev >= 0)
    assert(m.transform(df).select(min(col("prediction"))).head().getDouble(0) > 0)
  }

  test("intercept split convention: coef excludes last, intercept is last") {
    val df = lineitemGlm
    val m = new LogisticRegression(GlmParams(solver = "lbfgs", maxIter = 30))
    m.fit(df)
    assert(m.coef.length == 3)
    assert(m.intercept == m.rawCoef(3))
  }

  test("solver x regularizer constructor grid all fit (test_estimators.py:39-44)") {
    val df = lineitemGlm.limit(300).cache()
    for {
      solver <- Seq("admm", "gradient_descent", "newton", "lbfgs", "proximal_grad")
      reg <- Seq("l1", "l2", "elastic_net")
      // lbfgs+elastic_net faithfully raises (L1-part gradient undefined
      // at beta=0, regularizers.py:179-183); lbfgs+l1 routes to OWLQN
      if !(solver == "lbfgs" && reg == "elastic_net")
    } {
      val m = new LogisticRegression(
        GlmParams(solver = solver, regularizer = reg, maxIter = 2))
      m.fit(df)
      assert(m.rawCoef.toArray.forall(v => !v.isNaN), s"$solver/$reg")
    }
    df.unpersist()
  }

  test("SQL-visible minhash_sig via GraftExtensions-style registration") {
    graft.functions.TextHashFunctions.register(spark)
    val n = spark.sql(
      s"SELECT minhash_sig(text) AS s FROM parquet.`${TestSpark.sf0001}/documents.parquet`")
      .count()
    assert(n > 0)
  }

  test("SQL surface: width args and simhash_fp reachable, bad widths rejected") {
    graft.functions.TextHashFunctions.register(spark)
    val doc = s"parquet.`${TestSpark.sf0001}/documents.parquet`"
    // parameterized widths through the shared builders (the same ones
    // GraftExtensions injects)
    val row = spark.sql(
      s"""SELECT size(minhash_sig(text, 16)) AS w, simhash_fp(text) AS fp64,
             simhash_fp(text, 16) AS fp16
           FROM $doc LIMIT 1""").head()
    assert(row.getInt(0) == 16)
    assert(row.getLong(2) >= 0 && row.getLong(2) <= 0xffffL) // 16-bit range
    intercept[Exception](
      spark.sql(s"SELECT simhash_fp(text, 65) FROM $doc").collect())
    intercept[Exception](
      spark.sql(s"SELECT minhash_sig(text, 0) FROM $doc").collect())
  }

  test("fit_intercept=false leaves coef full-length") {
    val df = lineitemGlm
    val m = new LogisticRegression(
      GlmParams(solver = "lbfgs", maxIter = 30, fitIntercept = false))
    m.fit(df)
    assert(m.coef.length == 3 && m.intercept == 0.0)
  }

  test("serializedCache fit is bit-identical to the object-cache fit") {
    // MEMORY_AND_DISK_SER is the big-fit memory knob (GlmData.persist
    // scaladoc): serialization must round-trip the same IEEE bits in
    // the same partition order, so the two cache formats may not differ
    // by a single ulp in ANY coefficient — else the knob silently
    // changes results when a deployment flips it under memory pressure.
    val df = lineitemGlm.cache()
    def fit(ser: Boolean) = new LogisticRegression(GlmParams(
      solver = "admm", maxIter = 10, serializedCache = ser)).fit(df).rawCoef
    assert(fit(ser = false) == fit(ser = true),
      "serialized cache changed the fit — cache format is leaking into values")
    df.unpersist()
  }
}
