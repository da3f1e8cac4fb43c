package graft

import graft.ops.TokenLm
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Word-n-gram LM scoring (ops.TokenLm): gram extraction semantics,
  * hand-computed smoothing, order-column validation, and parity of the
  * native kernel with the explode+join composition. */
class TokenLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("tokenNgrams: windows, short-doc edge, empty-token boundary") {
    import spark.implicits._
    val out = Seq("a b c", "one", "", " x y")
      .toDF("text")
      .select(TokenLm.tokenNgrams(col("text"), 2).as("g"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b", "b c"))
    assert(out(1) == Seq.empty)
    assert(out(2) == Seq.empty) // "" -> one empty token -> no bigram
    assert(out(3) == Seq(" x", "x y")) // leading space -> empty first token
  }

  test("fit + score match hand-computed add-one smoothing") {
    import spark.implicits._
    // train "w w w": bigrams (w w) x2 -> vocab {w w: 2}, T=2, V=1,
    // denom=4; p(seen)=3/4, p(unseen)=1/4 — same numbers as the char case
    val model = TokenLm.fit(TokenLm.trainCounts(
      Seq("w w w").toDF("text"), order = 2))
    assert(model.order == 2 && model.vocabSize == 1)
    val lpSeen = math.round(math.log(3.0 / 4.0) * 1e9)
    val lpUnseen = math.round(math.log(1.0 / 4.0) * 1e9)
    val rows = TokenLm.score(
        Seq((1L, "w w w"), (2L, "a b"), (3L, "solo")).toDF("doc_id", "text"),
        model).orderBy("doc_id")
      .select("n_tri", "nll_nano", "avg_nll").collect()
    assert(rows(0).getInt(0) == 2 && rows(0).getLong(1) == -2 * lpSeen)
    assert(rows(1).getInt(0) == 1 && rows(1).getLong(1) == -lpUnseen)
    assert(rows(2).getInt(0) == 0 && rows(2).getLong(1) == 0L && rows(2).isNullAt(2))
  }

  test("native kernel equals the explode+join composition") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val counts = TokenLm.trainCounts(
      docs.filter(col("lang") === "en"), maxVocab = 256, order = 2)
    val model = TokenLm.fit(counts)
    val native = TokenLm.score(docs, model).select("doc_id", "nll_nano")
      .as[(Long, Long)].collect().toMap
    // composition twin: explode grams, broadcast-join the nanonat table
    val nanoTbl = {
      val t = model.nanoLogp
      import scala.jdk.CollectionConverters._
      t.asScala.toSeq.map { case (g, v) => (g, v.longValue()) }
        .toDF("tri", "nano")
    }
    val composed = docs
      .select(col("doc_id"), explode_outer(TokenLm.tokenNgrams(col("text"), 2)).as("tri"))
      .join(broadcast(nanoTbl), Seq("tri"), "left")
      .groupBy("doc_id")
      .agg(sum(when(col("tri").isNull, lit(0L))
        .otherwise(coalesce(col("nano"), lit(model.unseenNano)))).as("s"))
      .select(col("doc_id"), (-col("s")).as("nll"))
      .as[(Long, Long)].collect().toMap
    assert(native == composed)
  }

  test("qualityCleanStream: streamed keep set is the exact batch complement") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val model = TokenLm.fit(TokenLm.trainCounts(
      docs.filter(col("doc_id") < 25 && col("lang") === "en"),
      maxVocab = 512, order = 2))
    val bc = spark.sparkContext.broadcast(model)
    val nw = docs.filter(col("doc_id") >= 25).select("doc_id", "text")
      .unionByName(Seq((99991L, "solo")).toDF("doc_id", "text")) // < order tokens
    // pick the median avg_nll as threshold so the cut bites both ways
    val scored = TokenLm.score(nw, bc, "text")
    val thr = scored.filter(col("n_tri") > 0).stat
      .approxQuantile("avg_nll", Array(0.5), 0.0).head
    val batchKeep = scored
      .filter(col("n_tri") > 0 && col("avg_nll") <= thr)
      .select("doc_id").as[Long].collect().toSet
    val rows = nw.collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val q = TokenLm.qualityCleanStream(
        input.toDF().toDF("doc_id", "text"), bc, thr)
      .writeStream.outputMode("append").format("memory")
      .queryName("tok_clean_out").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("tok_clean_out")
        .select("doc_id").as[Long].collect().toSet
      assert(got == batchKeep, s"${got.size} streamed vs ${batchKeep.size} batch")
      assert(!got.contains(99991L))
      assert(batchKeep.nonEmpty && batchKeep.size < rows.length)
    } finally q.stop()
  }

  test("order rides the table: mixed orders rejected, missing n fails") {
    import spark.implicits._
    val a = TokenLm.trainCounts(Seq("x y z").toDF("text"), order = 2)
    val b = TokenLm.trainCounts(Seq("x y z").toDF("text"), order = 3)
    val e = intercept[IllegalArgumentException](TokenLm.fit(a.unionByName(b)))
    assert(e.getMessage.contains("mixes gram orders"))
    // persisted round trip refits identically
    val dir = java.nio.file.Files.createTempDirectory("tokenlm").toString
    a.write.mode("overwrite").parquet(dir)
    val refit = TokenLm.fit(spark.read.parquet(dir))
    val direct = TokenLm.fit(a)
    assert(refit.order == direct.order && refit.nanoLogp == direct.nanoLogp
      && refit.unseenNano == direct.unseenNano)
  }
}
