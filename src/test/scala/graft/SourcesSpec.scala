package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink round-trips + the docs' CSV end-to-end flow
  * (basic_api.ipynb: csv scan → filter → split → assemble → fit). */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  test("csv round-trip preserves values; explicit schema scan") {
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_returnflag").limit(100)
    val dir = tmp("csv_rt")
    Sources.writeCsv(li, dir)
    val back = Sources.readCsv(spark, dir, li.schema)
    assert(back.count() == 100)
    val a = li.orderBy("l_orderkey", "l_quantity").collect().map(_.toString)
    val b = back.orderBy("l_orderkey", "l_quantity").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("json round-trip preserves values") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet").limit(50)
    val dir = tmp("json_rt")
    Sources.writeJson(docs, dir)
    val back = Sources.readJson(spark, dir, docs.schema)
    assert(back.orderBy("doc_id").collect().map(_.toString)
      .sameElements(docs.orderBy("doc_id").collect().map(_.toString)))
  }

  test("partitioned parquet sink enables partition pruning") {
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val dir = tmp("part_parquet")
    Sources.writeParquet(li, dir, partitionByCols = Seq("l_returnflag"))
    val pruned = Sources.readParquet(spark, dir).filter(col("l_returnflag") === "R")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan)
    assert(pruned.count() ==
      li.filter(col("l_returnflag") === "R").count())
  }

  test("docs end-to-end: csv scan -> filter -> randomSplit -> fit -> score") {
    // the basic_api.ipynb flow with lineitem standing in for the taxi CSV
    val dir = tmp("docs_flow")
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag")
    Sources.writeCsv(li, dir)
    val csv = Sources.readCsv(spark, dir, li.schema)
      .filter(col("l_quantity") < lit(45) && col("l_extendedprice") < lit(80000))
    val df = csv.select(
      array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .as("features"),
      (col("l_returnflag") === "R").cast("double").as("label"))
    val Array(train, test) = df.randomSplit(Array(0.5, 0.5), seed = 2)
    val m = new graft.estimators.LogisticRegression(
      graft.estimators.GlmParams(solver = "lbfgs", maxIter = 30))
      .fit(train.repartition(2).cache())
    val acc = m.score(test)
    assert(acc > 0.5, s"acc=$acc")
  }
}
