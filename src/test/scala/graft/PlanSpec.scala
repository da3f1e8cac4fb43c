package graft

import graft.queries.{Queries, Relational}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-hygiene gates (the 100 TB discipline, SURVEY §4): filters reach
  * the parquet scan, column pruning holds, small dimensions broadcast,
  * and the GLM kernel path contains zero shuffles. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def formatted(name: String): String = {
    val df = Queries.byName(name).spark(spark, TestSpark.sf0001)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q02 filter is pushed to the parquet scan") {
    val plan = formatted("q02_filter_project")
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("LessThan(l_quantity,5.0)") ||
      plan.contains("l_quantity"), plan)
  }

  test("q02 scan reads only the projected columns (pruning)") {
    val plan = formatted("q02_filter_project")
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_comment"),
      readSchema)
  }

  test("q03 broadcasts the customer dimension") {
    val plan = formatted("q03_join_agg")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("q16 star join broadcasts both small dims (no shuffle join)") {
    val plan = formatted("q16_star_join")
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q40 knn corpus side is not shuffled (broadcast nested loop)") {
    val plan = formatted("q40_knn_cosine")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("q01 uses partial aggregation (map-side combine)") {
    val plan = formatted("q01_pricing_summary")
    assert(plan.contains("HashAggregate"), plan)
    // partial + final pair
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("whole-stage codegen covers the q01 scan+agg pipeline") {
    // AQE only materializes codegen stages at execution time
    val df = Queries.byName("q01_pricing_summary").spark(spark, TestSpark.sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // codegen stages print as "*(n) Op" in executed-plan dumps
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
  }

  test("GLM kernel pass plan has zero exchanges (no shuffle in solvers)") {
    import graft.core.GlmData
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    val df = li.select(
      array(col("l_quantity"), col("l_discount")).as("features"),
      (col("l_returnflag") === "R").cast("double").as("label"))
    // the kernel consumes df's RDD directly: assert the *DataFrame* plan
    // (scan+project) has no exchange, i.e. kernels add none
    def countShuffles(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => countShuffles(a.executedPlan)
      case s: ShuffleExchangeExec => 1 + s.children.map(countShuffles).sum
      case other => other.children.map(countShuffles).sum
    }
    assert(countShuffles(df.queryExecution.executedPlan) == 0)
    val data = GlmData.fromDF(df, numFeatures = 2)
    // one kernel call → driver gets O(p) result; no shuffle dependency in lineage
    val (_, g) = graft.linalg.Kernels.lossGrad(data, breeze.linalg.DenseVector.zeros[Double](2), graft.families.Logistic)
    assert(g.length == 2)
  }
}
