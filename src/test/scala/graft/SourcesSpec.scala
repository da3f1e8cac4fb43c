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

  test("orc round-trip preserves values and pushes filters to the scan") {
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_returnflag").limit(100)
    val dir = tmp("orc_rt")
    Sources.writeOrc(li, dir)
    val back = Sources.readOrc(spark, dir)
    assert(back.orderBy("l_orderkey", "l_quantity").collect().map(_.toString)
      .sameElements(li.orderBy("l_orderkey", "l_quantity").collect().map(_.toString)))
    // ORC's V2 reader gets the same pushdown treatment as parquet
    val plan = back.filter(col("l_quantity") < 5.0).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_quantity"), plan)
  }

  test("text round-trip: raw corpus lines in, one `value` column out") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select("text").limit(50)
    val dir = tmp("text_rt")
    Sources.writeText(docs, dir)
    val back = Sources.readText(spark, dir)
    assert(back.columns.toSeq == Seq("value"))
    assert(back.orderBy("value").collect().map(_.getString(0)).toSeq ==
      docs.orderBy("text").collect().map(_.getString(0)).toSeq)
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

  test("writeShards: one dir per shard, on-disk order = pack stream order") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " +")).as("n_tok"))
    val packed = graft.ops.Sampling.packSequences(
      docs, "doc_id", col("n_tok"), ctxLen = 512, shards = 4, seed = 7L)
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    graft.sources.Sources.writeShards(
      packed.select("doc_id", "shard", "start_off", "end_off"),
      dir, "shard", Seq("start_off"))
    val shardDirs = new java.io.File(dir).listFiles
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.length == 4, shardDirs.map(_.getName).mkString(","))
    // within each shard the rows sit in stream order on disk, tiling the
    // token stream exactly as packSequences laid it out
    for (sd <- shardDirs) {
      val rows = spark.read.parquet(sd.toString)
        .select("doc_id", "start_off", "end_off").collect()
      val offs = rows.map(_.getLong(1))
      assert(offs.sameElements(offs.sorted), sd.getName)
      assert(rows.head.getLong(1) == 0L)
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(2) == b.getLong(1), sd.getName)
        case _ => ()
      }
    }
    // a rerun reproduces the identical per-shard row sequence
    val again = java.nio.file.Files.createTempDirectory("graft_shards2").toString
    graft.sources.Sources.writeShards(
      packed.select("doc_id", "shard", "start_off", "end_off"),
      again, "shard", Seq("start_off"))
    for (sd <- shardDirs) {
      val a = spark.read.parquet(sd.toString).select("doc_id").collect().map(_.getLong(0)).toSeq
      val b = spark.read.parquet(s"$again/${sd.getName}").select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(a == b, sd.getName)
    }
  }

  test("bucketed tables co-locate the join: ZERO exchange in the plan") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    Sources.writeBucketed(li, "li_bkt", 4, Seq("l_orderkey"), Seq("l_orderkey"))
    Sources.writeBucketed(ord, "ord_bkt", 4, Seq("o_orderkey"), Seq("o_orderkey"))
    // disable broadcast so the test proves BUCKETING (not broadcast)
    // removes the exchange — at 100 TB neither side broadcasts
    val prevBcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Sources.readTable(spark, "li_bkt")
        .join(Sources.readTable(spark, "ord_bkt"),
          col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      val n = joined.collect()(0).getLong(0)
      assert(n > 0)
      def shuffles(p: SparkPlan): Int = p match {
        case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
        case qs: QueryStageExec => shuffles(qs.plan)
        case s: ShuffleExchangeExec => 1 + s.children.map(shuffles).sum
        case other => other.children.map(shuffles).sum
      }
      // same bucket count on the join key on both sides → the join itself
      // needs no exchange; the only shuffle is the final 1-row aggregate
      assert(shuffles(joined.queryExecution.executedPlan) <= 1,
        joined.queryExecution.executedPlan.toString)
      val joinPlan = joined.queryExecution.executedPlan.toString
      assert(joinPlan.contains("SortMergeJoin") || joinPlan.contains("ShuffledHashJoin"),
        joinPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
      spark.sql("DROP TABLE IF EXISTS li_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }
}
