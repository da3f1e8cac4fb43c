package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The SURVEY §7.1 minimum end-to-end slice: read lineitem parquet,
    * assemble features [l_quantity, l_extendedprice, l_discount], label
    * l_returnflag == 'R', fit a normalized gradient-descent logistic
    * regression, and return scored predictions.
    */
  def entry(spark: SparkSession): DataFrame = {
    import graft.estimators.{GlmParams, LogisticRegression}
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val df = li.select(
      col("l_orderkey"),
      col("l_linenumber"),
      array(col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .as("features"),
      (col("l_returnflag") === "R").cast("double").as("label"))
    val model =
      new LogisticRegression(GlmParams(solver = "gradient_descent", maxIter = 50))
        .fit(df)
    model.transform(df)
      .select("l_orderkey", "l_linenumber", "label", "probability", "prediction")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Queries.all.map(q => q.name -> q.spark).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Queries.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
