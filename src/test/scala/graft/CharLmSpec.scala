package graft

import graft.functions.CharLmFunctions
import graft.ops.CharLm
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Character-trigram LM perplexity scoring (ops.CharLm): extractor
  * semantics, the deterministic vocab cap, hand-computed smoothing math,
  * unseen handling, and scale-shape gates (no shuffle at score time). */
class CharLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("char_trigrams: codepoint windows, short-string edge") {
    import spark.implicits._
    val out = Seq("abcd", "ab", "", "héllo", "你好世界")
      .toDF("text")
      .select(CharLmFunctions.charTrigrams(col("text")).as("t"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("abc", "bcd"))
    assert(out(1) == Seq.empty)
    assert(out(2) == Seq.empty)
    assert(out(3) == Seq("hél", "éll", "llo"))
    assert(out(4) == Seq("你好世", "好世界"))
  }

  test("char_trigrams: supplementary-plane chars count once") {
    import spark.implicits._
    // "a𝄞bc" is 5 Java chars but 4 codepoints -> windows a𝄞b, 𝄞bc
    val s = "a" + new String(Character.toChars(0x1D11E)) + "bc"
    val out = Seq(s).toDF("text")
      .select(CharLmFunctions.charTrigrams(col("text")).as("t"))
      .as[Seq[String]].collect().head
    assert(out.length == 2)
    assert(out(0) == s.substring(0, 4) && out(1) == s.substring(1))
  }

  test("fit + score match hand-computed add-one smoothing") {
    import spark.implicits._
    // train corpus "aaaa" -> trigrams aaa, aaa => vocab {aaa: 2}
    // T = 2, V = 1, denom = 4; p(aaa) = 3/4, p(unseen) = 1/4
    val train = Seq("aaaa").toDF("text")
    val model = CharLm.fit(CharLm.trainCounts(train))
    assert(model.vocabSize == 1)
    val lpSeen = math.round(math.log(3.0 / 4.0) * 1e9)
    val lpUnseen = math.round(math.log(1.0 / 4.0) * 1e9)
    assert(model.nanoLogp.get("aaa") == lpSeen)
    assert(model.unseenNano == lpUnseen)

    val docs = Seq((1L, "aaaa"), (2L, "abc"), (3L, "x")).toDF("doc_id", "text")
    val rows = CharLm.score(docs, model).orderBy("doc_id")
      .select("doc_id", "n_tri", "nll_nano", "avg_nll").collect()
    // doc 1: two seen trigrams
    assert(rows(0).getInt(1) == 2 && rows(0).getLong(2) == -2 * lpSeen)
    assert(rows(0).getDouble(3) ==
      BigDecimal(-2.0 * lpSeen / (2 * 1e9))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // doc 2: one unseen trigram
    assert(rows(1).getInt(1) == 1 && rows(1).getLong(2) == -lpUnseen)
    // doc 3: shorter than 3 codepoints -> zero trigrams, NULL avg
    assert(rows(2).getInt(1) == 0 && rows(2).getLong(2) == 0L && rows(2).isNullAt(3))
  }

  test("order threads train->fit->score; mixed gram widths rejected") {
    import spark.implicits._
    // order 5 on "aaaaaa": grams aaaaa x2 -> vocab {aaaaa: 2}, T=2, V=1
    val model = CharLm.fit(CharLm.trainCounts(
      Seq("aaaaaa").toDF("text"), order = 5))
    assert(model.order == 5 && model.vocabSize == 1)
    val lp = math.round(math.log(3.0 / 4.0) * 1e9)
    val rows = CharLm.score(Seq((1L, "aaaaaa"), (2L, "aaaa")).toDF("doc_id", "text"),
        model).orderBy("doc_id")
      .select("n_tri", "nll_nano").collect()
    assert(rows(0).getInt(0) == 2 && rows(0).getLong(1) == -2 * lp)
    assert(rows(1).getInt(0) == 0 && rows(1).getLong(1) == 0L) // shorter than order
    // a counts table mixing widths (concatenated artifacts) fails loudly
    val mixed = CharLm.trainCounts(Seq("aaaa").toDF("text"), order = 3)
      .unionByName(CharLm.trainCounts(Seq("bbbbb").toDF("text"), order = 4))
    val e = intercept[IllegalArgumentException](CharLm.fit(mixed))
    assert(e.getMessage.contains("mixes gram widths"))
  }

  test("vocab cap keeps the most frequent trigrams, ties by trigram asc") {
    import spark.implicits._
    // counts: "aaa" x3 (from aaaaa), "bbb" x1, "ccc" x1 -> cap 2 keeps
    // aaa (count 3) then bbb (tie 1 vs ccc, 'bbb' < 'ccc')
    val train = Seq("aaaaa", "bbb", "ccc").toDF("text")
    val kept = CharLm.trainCounts(train, maxVocab = 2)
      .as[(String, Long)].collect().toMap
    assert(kept == Map("aaa" -> 3L, "bbb" -> 1L))
  }

  test("char_trigrams SQL surface: registered function and arity check") {
    graft.functions.CharLmFunctions.register(spark)
    val got = spark.sql("SELECT char_trigrams('abcd') AS t")
      .head().getSeq[String](0)
    assert(got == Seq("abc", "bcd"))
    intercept[Exception] {
      spark.sql("SELECT char_trigrams('a', 'b')").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT char_trigrams(array(1))").collect()
    }
  }

  test("fit fails loudly on an empty training slice") {
    import spark.implicits._
    val e = intercept[IllegalArgumentException] {
      CharLm.fit(CharLm.trainCounts(Seq("ab", "").toDF("text")))
    }
    assert(e.getMessage.contains("training slice is empty"))
  }

  test("fit rejects a malformed counts table; score guards output names") {
    import spark.implicits._
    val bad = Seq(("aaa", 0L)).toDF("tri", "c")
    val e = intercept[IllegalArgumentException](CharLm.fit(bad))
    assert(e.getMessage.contains("count < 1"))
    val model = CharLm.fit(CharLm.trainCounts(Seq("aaaa").toDF("text")))
    val clash = Seq((1L, "abc", 9)).toDF("doc_id", "text", "n_tri")
    val e2 = intercept[IllegalArgumentException](CharLm.score(clash, model))
    assert(e2.getMessage.contains("score output columns"))
  }

  test("in-domain text scores lower avg_nll than out-of-domain") {
    import spark.implicits._
    val english = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a stitch in time saves nine they say",
      "all that glitters is not gold my friend").toDF("text")
    val model = CharLm.fit(CharLm.trainCounts(english))
    val docs = Seq(
      (1L, "the quick brown dog jumps over a lazy fox"),
      (2L, "zzqx jvwk pfft qqqq xxyz wvvw kkjj")).toDF("doc_id", "text")
    val s = CharLm.score(docs, model).select("doc_id", "avg_nll")
      .orderBy("doc_id").as[(Long, Double)].collect()
    assert(s(0)._2 < s(1)._2,
      s"in-domain ${s(0)._2} should beat gibberish ${s(1)._2}")
  }

  test("scale shape: scoring plan has no shuffle and an O(1) plan size") {
    import spark.implicits._
    val train = Seq("the quick brown fox the quick brown fox").toDF("text")
    val model = CharLm.fit(CharLm.trainCounts(train))
    val docs = Seq((1L, "the quick")).toDF("doc_id", "text")
    val plan = CharLm.score(docs, model).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"score must not shuffle:\n$plan")
    assert(plan.length < 20000, "plan must not embed the vocabulary")
  }

  test("trainCounts cap is a distributed top-K, not a global sort") {
    import spark.implicits._
    val train = Seq("aaaa", "bbbb").toDF("text").repartition(4)
    val plan = CharLm.trainCounts(train, maxVocab = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab cap should compile to TakeOrderedAndProject:\n$plan")
  }

  test("qualityCleanStream: streamed keep set is the exact batch complement") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val model = CharLm.fit(CharLm.trainCounts(
      docs.filter(col("doc_id") < 25 && col("lang") === "en"), maxVocab = 512))
    val bc = spark.sparkContext.broadcast(model)
    val nw = docs.filter(col("doc_id") >= 25).select("doc_id", "text")
      // a sub-3-codepoint doc must be dropped, not crash or pass
      .unionByName(Seq((99990L, "ab")).toDF("doc_id", "text"))
    val thr = 5.365
    val batchKeep = CharLm.score(nw, bc, "text")
      .filter(col("n_tri") > 0 && col("avg_nll") <= thr)
      .select("doc_id").as[Long].collect().toSet
    val rows = nw.collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val stream = CharLm.qualityCleanStream(
      input.toDF().toDF("doc_id", "text"), bc, thr)
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("lm_clean_out").start()
    try {
      val (first, second) = rows.splitAt(rows.length / 2)
      input.addData(first: _*)
      q.processAllAvailable()
      input.addData(second: _*)
      q.processAllAvailable()
      val out = spark.table("lm_clean_out")
      assert(out.columns.toSeq == Seq("doc_id", "text"))
      val got = out.select("doc_id").as[Long].collect().toSeq
      assert(got.distinct.size == got.size, "kept docs must not repeat")
      assert(got.toSet == batchKeep,
        s"${got.size} streamed vs ${batchKeep.size} batch-kept")
      assert(!got.contains(99990L), "evidence-free short doc must be dropped")
      assert(batchKeep.nonEmpty && batchKeep.size < rows.length,
        s"threshold underexercised: ${batchKeep.size}/${rows.length} kept")
    } finally q.stop()
  }

  test("langId: disjoint-alphabet languages classify exactly; ties break asc") {
    import spark.implicits._
    val train = Seq(
      ("aa", "aaaa aaa aaaa"), ("aa", "aaa aaaa"),
      ("bb", "bbbb bbb bbbb"), ("bb", "bbb bbbb")).toDF("lang", "text")
    val models = CharLm.fitByLang(CharLm.trainCountsByLang(train))
    assert(models.keySet == Set("aa", "bb"))
    val docs = Seq(
      (1L, "aaaa aaaa"),   // pure a -> aa
      (2L, "bbbb bbbb"),   // pure b -> bb
      (3L, "zz"),          // shorter than order -> NULL
      (4L, "cccc cccc")    // unseen everywhere: every gram takes each
                            // model's unseen floor -> tie -> 'aa' (asc)
      ).toDF("doc_id", "text")
    val out = CharLm.langId(docs, models).orderBy("doc_id")
      .select("guess").collect()
    assert(out(0).getString(0) == "aa")
    assert(out(1).getString(0) == "bb")
    assert(out(2).isNullAt(0))
    // both models have identical vocab sizes/counts by construction, so
    // the unseen floors are equal and the tie must break to 'aa'
    assert(out(3).getString(0) == "aa")
  }

  test("perplexityBuckets: ordered tiers, ~even split, NULL for evidence-free") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val model = CharLm.fit(CharLm.trainCounts(
      docs.filter(col("lang") === "en"), maxVocab = 512))
    val scored = CharLm.score(
      docs.select("doc_id", "text")
        .unionByName(Seq((99992L, "ab")).toDF("doc_id", "text")), model)
    val out = CharLm.perplexityBuckets(scored)
      .select("doc_id", "avg_nll", "ppl_bucket").collect()
    val byBucket = out.filter(!_.isNullAt(2))
      .groupBy(_.getInt(2)).view.mapValues(_.map(_.getDouble(1))).toMap
    assert(byBucket.keySet == Set(1, 2, 3))
    // tiers are ORDERED: every head doc <= every middle doc <= every tail
    assert(byBucket(1).max <= byBucket(2).min + 1e-9)
    assert(byBucket(2).max <= byBucket(3).min + 1e-9)
    // roughly even (bin-granularity slack)
    val sizes = byBucket.view.mapValues(_.length).toMap
    val n = sizes.values.sum
    sizes.values.foreach(s => assert(s > n / 6, s"degenerate tier: $sizes"))
    // the evidence-free doc has no tier
    assert(out.find(_.getLong(0) == 99992L).get.isNullAt(2))
    // rerun under a different partitioning is identical
    val again = CharLm.perplexityBuckets(CharLm.score(
        docs.select("doc_id", "text").repartition(7), model))
      .select("doc_id", "ppl_bucket").as[(Long, Int)].collect().toMap
    val first = out.filter(!_.isNullAt(2))
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(again == first)
  }

  test("persisted counts table refits to an identical model") {
    import spark.implicits._
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val counts = CharLm.trainCounts(
      docs.filter(col("lang") === "en"), maxVocab = 256)
    val dir = java.nio.file.Files.createTempDirectory("charlm_counts").toString
    counts.write.mode("overwrite").parquet(dir)
    val direct = CharLm.fit(counts)
    val refit = CharLm.fit(spark.read.parquet(dir))
    assert(refit.unseenNano == direct.unseenNano)
    assert(refit.nanoLogp == direct.nanoLogp)
    // and the scores agree end-to-end (the ingest example's contract)
    val a = CharLm.score(docs, direct).select("doc_id", "nll_nano")
      .as[(Long, Long)].collect().toMap
    val b = CharLm.score(docs, refit).select("doc_id", "nll_nano")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("registry q115 shape: nll_nano is exact and rerun-stable") {
    import spark.implicits._
    val docs = (0L until 60L).map(i =>
      (i, s"document number $i with some shared english text payload"))
      .toDF("doc_id", "text")
    val model = CharLm.fit(CharLm.trainCounts(docs, maxVocab = 128))
    val a = CharLm.score(docs.repartition(7), model)
      .select("doc_id", "nll_nano").as[(Long, Long)].collect().toMap
    val b = CharLm.score(docs.repartition(3), model)
      .select("doc_id", "nll_nano").as[(Long, Long)].collect().toMap
    assert(a == b, "integer nanonat sums must not depend on partitioning")
  }
}
