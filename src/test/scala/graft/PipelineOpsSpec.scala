package graft

import graft.functions.{MinHashSig, TextHashFunctions}
import graft.ops.Multimodal
import graft.streaming.EventStream
import graft.queries.Queries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing, streaming, and native-expression specs. */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("minhash_sig native expression ≡ composed higher-order form") {
    import spark.implicits._
    TextHashFunctions.register(spark)
    val df = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f g"), // identical → identical signature
      (3L, "x y z w v u t s r q"),
      (4L, "ab"), // < 3 tokens → MaxValue signature
      (5L, "one two three")).toDF("id", "text")
    val native = df.selectExpr("id", "minhash_sig(text) as sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // composed Catalyst form (the q44 original)
    val toks = split(col("text"), " +")
    val shingles = when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2),
          element_at(toks, i + 3))))).otherwise(array().cast("array<string>"))
    val hashes = transform(shingles, sh => conv(substring(md5(sh), 1, 8), 16, 10).cast("long"))
    val sig = aggregate(hashes,
      array((0 until 8).map(_ => lit(Long.MaxValue)): _*),
      (acc, h) => array((0 until 8).map(i =>
        least(element_at(acc, i + 1),
          pmod(h * (2L * i + 1) + (1L * i * i + 7), lit(2147483647L)))): _*))
    val composed = df.select(col("id"), sig.as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == composed)
    assert(native(1L) == native(2L))
    assert(native(1L) != native(3L))
    assert(native(4L).forall(_ == Long.MaxValue))
  }

  test("minhash width 128: recall on seeded near-dup fixture ≥ width-8 run") {
    import spark.implicits._
    TextHashFunctions.register(spark)
    // seeded fixture: 40 base docs of 25 tokens from a 50-word vocab; the
    // first 20 get a near-dup twin with 2 tokens mutated (shingle jaccard
    // ≈ 0.6 — squarely in the band-probability S-curve's sensitive zone)
    val rng = new scala.util.Random(42)
    val vocab = (0 until 50).map(i => s"w$i")
    val bases = (0 until 40).map { i =>
      i.toLong -> Seq.fill(25)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    }
    val twins = bases.take(20).map { case (i, text) =>
      val toks = text.split(" ")
      toks(5 + rng.nextInt(10)) = vocab(rng.nextInt(vocab.size))
      toks(20) = vocab(rng.nextInt(vocab.size))
      (i + 1000L) -> toks.mkString(" ")
    }
    val df = (bases ++ twins).toDF("id", "text")
    val truth = (0 until 20).map(i => (i.toLong, i + 1000L)).toSet
    // equal rows-per-band (2) so the comparison isolates signature width:
    // more bands at the same band width → strictly better recall odds
    def recall(bands: Int, numHashes: Int): Double = {
      val cands = graft.ops.Dedup
        .minhashCandidates(df, "id", "text", bands = bands, numHashes = numHashes)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      truth.count(cands.contains).toDouble / truth.size
    }
    val r8 = recall(bands = 4, numHashes = 8)
    val r128 = recall(bands = 64, numHashes = 128)
    assert(r128 >= r8, s"width-128 recall $r128 < width-8 recall $r8")
    assert(r128 >= 0.9, s"width-128 recall $r128")
    // width argument is SQL-visible and sizes the signature
    val sig = df.limit(1).selectExpr("minhash_sig(text, 128) AS s")
      .head().getSeq[Long](0)
    assert(sig.length == 128)
  }

  test("multimodal: schema, feature extraction batch shape, frame sampling") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val media = Multimodal.mediaFromDocuments(docs)
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "payload", "meta"))
    val feats = media.withColumn("feat", Multimodal.extractFeatures(col("payload")))
      .select("media_id", "feat").limit(10).collect()
    assert(feats.forall(_.getSeq[Double](1).length == 4))
    val frames = media
      .withColumn("frames", Multimodal.sampleFrames(col("payload"), 3))
      .select(size(col("frames"))).limit(5).collect()
    assert(frames.forall(_.getInt(0) <= 3))
  }

  test("streaming tumbling counts match the batch twin (memory sink)") {
    val dir = TestSpark.sf0001
    val batch = EventStream.tumblingCounts(Queries.eventsTbl(spark, dir))
      .orderBy("win_start", "event_type").collect()

    val rawSchema = EventStream.rawEventsSchema(spark, s"$dir/events.parquet")
    // the file-stream source wants a directory; stage the parquet into one
    val tmp = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      tmp.resolve("events.parquet"))
    val stream = spark.readStream.schema(rawSchema)
      .parquet(tmp.toString)
      .transform(Queries.normalizeEventsTs)
    val q = EventStream.tumblingCountsStreaming(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .orderBy("win_start", "event_type").collect()
      assert(streamed.length == batch.length)
      assert(streamed.map(_.toString).sameElements(batch.map(_.toString)))
    } finally q.stop()
  }

  test("streaming sliding counts match the batch twin (memory sink)") {
    val dir = TestSpark.sf0001
    val batch = EventStream.slidingCounts(Queries.eventsTbl(spark, dir))
      .orderBy("win_start", "event_type").collect()
    val rawSchema = EventStream.rawEventsSchema(spark, s"$dir/events.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("events_slide")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      tmp.resolve("events.parquet"))
    val stream = spark.readStream.schema(rawSchema)
      .parquet(tmp.toString)
      .transform(Queries.normalizeEventsTs)
    val q = EventStream.slidingCountsStreaming(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sliding_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sliding_out")
        .orderBy("win_start", "event_type").collect()
      assert(streamed.length == batch.length)
      assert(streamed.map(_.toString).sameElements(batch.map(_.toString)))
    } finally q.stop()
  }

  test("stream-stream interval join matches batch twin; late right side dropped") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2020-01-01 10:$m%02d:00")
    // fixture: user 1 has a view at 10:00 and clicks at 10:05 (inside the
    // 10-min window) and 10:20 (outside); user 2's click precedes any view
    val clickRows = Seq((101L, ts(5), 1L), (102L, ts(20), 1L), (103L, ts(2), 2L))
    val viewRows = Seq((201L, ts(0), 1L), (202L, ts(6), 2L))
    val clicksB = clickRows.toDF("event_id", "ts", "user_id")
    val viewsB = viewRows.toDF("event_id", "ts", "user_id")
    val batch = EventStream.intervalJoinBatch(clicksB, viewsB, windowMinutes = 10)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == Set((101L, 201L))) // only the in-window attribution

    val clickIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val viewIn = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val clicks = clickIn.toDF().toDF("event_id", "ts", "user_id")
    val views = viewIn.toDF().toDF("event_id", "ts", "user_id")
    val joined = EventStream.intervalJoinStreaming(clicks, views, windowMinutes = 10)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ivj_out").start()
    try {
      viewIn.addData(viewRows: _*)
      clickIn.addData(clickRows: _*)
      q.processAllAvailable()
      // advance both watermarks far past the fixture so results flush
      viewIn.addData((999L, ts(59), 99L))
      clickIn.addData((998L, ts(59), 98L))
      q.processAllAvailable()
      val streamed = spark.table("ivj_out").select("l_id", "r_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("stream-static join enriches a stream from a broadcast dimension") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // static dimension (the broadcast side — no state, no watermark needed)
    val dim = spark.read.parquet(s"${TestSpark.sf0001}/nation.parquet")
      .select(col("n_nationkey").cast("long").as("key"), col("n_name"))
    val input = MemoryStream[(Long, Long, Double)]
    val stream = input.toDF().toDF("event_id", "key", "value")
    val q = stream.join(broadcast(dim), Seq("key"))
      .writeStream.outputMode("append").format("memory")
      .queryName("enrich_out").start()
    try {
      input.addData((1L, 0L, 1.0), (2L, 3L, 2.0), (3L, 9999L, 3.0)) // 9999: no dim row
      q.processAllAvailable()
      val out = spark.table("enrich_out").select("event_id", "n_name").collect()
      assert(out.length == 2) // inner join drops the unmatched key
      assert(out.forall(r => r.getString(1).nonEmpty))
      assert(out.map(_.getLong(0)).toSet == Set(1L, 2L))
    } finally q.stop()
  }

  test("hashSample on a stream: stateless filter, batch-identical pick") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // the keyed coin is a pure per-row function: the SAME operator runs
    // on a stream with no state, no watermark, no output-mode caveats —
    // and picks exactly the rows its batch twin picks, regardless of
    // how the stream is micro-batched
    val input = MemoryStream[Long]
    val stream = graft.ops.Sampling.hashSample(
      input.toDF().toDF("doc_id"), col("doc_id"), 0.25, 7L)
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("sample_out").start()
    try {
      input.addData(0L to 99L: _*)
      q.processAllAvailable()
      input.addData(100L to 199L: _*) // second micro-batch
      q.processAllAvailable()
      val got = spark.table("sample_out").collect().map(_.getLong(0)).toSet
      val want = graft.ops.Sampling.hashSample(
        (0L to 199L).toDF("doc_id"), col("doc_id"), 0.25, 7L)
        .collect().map(_.getLong(0)).toSet
      assert(got == want)
      assert(got.nonEmpty && got.size < 200)
    } finally q.stop()
  }

  test("quality classifier: featurize + glm fit separates boilerplate degrades") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val degraded = docs.withColumn("text",
      concat_ws(" ", flatten(array_repeat(
        slice(split(col("text"), " +"), 1, 5), 8))))
    val train = graft.examples.QualityClassifier.featurize(
        docs.withColumn("label", lit(1.0))
          .unionByName(degraded.withColumn("label", lit(0.0))), "text")
      .select("features", "label")
    val model = new graft.estimators.LogisticRegression(
      graft.estimators.GlmParams(solver = "admm", regularizer = "l2",
        lamduh = 0.1)).fit(train)
    // template spam has collapsed type-token ratio: a linear model on
    // the feature family separates it essentially perfectly
    assert(model.score(train) >= 0.99, model.score(train).toString)
    // the probability column is the quality score; clean docs all pass
    // the GPT-3-style cut while their degraded twins all fail it
    val scored = graft.examples.QualityClassifier.featurize(docs, "text")
      .withColumn("q", model.predictProbaCol(col("features")))
    assert(scored.filter(col("q") >= 0.5).count() == docs.count())
    val scoredBad = graft.examples.QualityClassifier.featurize(degraded, "text")
      .withColumn("q", model.predictProbaCol(col("features")))
    assert(scoredBad.filter(col("q") >= 0.5).count() <= docs.count() / 100)
  }

  test("minhashCleanStream: streamed clean set is the exact batch complement") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val ref = docs.filter(col("doc_id") < 400)
    val nw = docs.filter(col("doc_id") >= 400)
      .select("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("mh_stream").toString
    graft.ops.Dedup.writeBandedSignatures(ref, "doc_id", "text", dir)
    val bandsDf = spark.read.parquet(dir)
    // batch truth: new docs with >= 1 candidate pair are dups; the
    // stream filter must pass exactly the complement
    val dupIds = graft.ops.Dedup.minhashCandidatesAgainstBands(
        nw, bandsDf, "doc_id", "text")
      .select("new_id").collect().map(_.getLong(0)).toSet
    val allIds = nw.select("doc_id").collect().map(_.getLong(0)).toSet
    val newRows = nw.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[(Long, String, String)]
    val stream = graft.ops.Dedup.minhashCleanStream(
      input.toDF().toDF("doc_id", "text", "lang"), bandsDf, "text")
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("mh_clean_out").start()
    try {
      val (first, second) = newRows.splitAt(newRows.length / 2)
      input.addData(first: _*)
      q.processAllAvailable()
      input.addData(second: _*) // second micro-batch: same static table
      q.processAllAvailable()
      val out = spark.table("mh_clean_out")
      // all original columns pass through, one row per clean doc
      assert(out.columns.toSeq == Seq("doc_id", "text", "lang"))
      val got = out.collect().map(_.getLong(0)).toSeq
      assert(got.distinct.size == got.size, "clean docs must not repeat")
      assert(got.toSet == (allIds -- dupIds),
        s"${got.size} streamed vs ${(allIds -- dupIds).size} batch-clean")
      assert(dupIds.nonEmpty, "fixture must exercise the dup path")
    } finally q.stop()
  }

  test("exactCleanStream: streamed clean set is the exact batch complement") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val ref = docs.filter(col("doc_id") < 250)
    // make the dup path non-trivial: half the new batch shares ref text
    // deterministic injected dupes (an unordered limit(25) could pick
    // different ref rows on each of the three actions below)
    val nw = docs.filter(col("doc_id") >= 250 && col("doc_id") < 400)
      .select("doc_id", "text")
      .unionByName(ref.filter(col("doc_id") < 25)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val dupIds = graft.ops.Dedup.exactMatchesAgainst(nw, ref,
      "doc_id", Seq("text")).collect().map(_.getLong(0)).toSet
    val allIds = nw.select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = nw.collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val stream = graft.ops.Dedup.exactCleanStream(
      input.toDF().toDF("doc_id", "text"), ref, Seq("text"))
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("ex_clean_out").start()
    try {
      val (first, second) = rows.splitAt(rows.length / 2)
      input.addData(first: _*)
      q.processAllAvailable()
      input.addData(second: _*)
      q.processAllAvailable()
      val out = spark.table("ex_clean_out")
      assert(out.columns.toSeq == Seq("doc_id", "text"))
      val got = out.collect().map(_.getLong(0)).toSeq
      assert(got.distinct.size == got.size, "clean docs must not repeat")
      assert(got.toSet == (allIds -- dupIds),
        s"${got.size} streamed vs ${(allIds -- dupIds).size} batch-clean")
      assert(dupIds.size >= 25, s"dup path underexercised: ${dupIds.size}")
    } finally q.stop()
  }

  test("simhashCleanStream: streamed clean set is the exact batch complement") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val ref = docs.filter(col("doc_id") < 400)
    val nw = docs.filter(col("doc_id") >= 400).select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("sh_stream").toString
    graft.ops.Dedup.writeSimhashSignatures(ref, "doc_id", "text", dir)
    val sigDf = spark.read.parquet(dir)
    // batch truth at an UNCAPPED reference (the stream filter tests
    // existence, which is cap-invariant only when no bucket is emptied —
    // keep both sides uncapped for exactness)
    val dupIds = graft.ops.Dedup.simhashNearDupsAgainst(
        nw, ref, "doc_id", "text", maxHamming = 20,
        maxBucket = Int.MaxValue)
      .select("new_id").collect().map(_.getLong(0)).toSet
    val allIds = nw.select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = nw.collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val stream = graft.ops.Dedup.simhashCleanStream(
      input.toDF().toDF("doc_id", "text"), sigDf, "text", maxHamming = 20)
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("sh_clean_out").start()
    try {
      val (first, second) = rows.splitAt(rows.length / 2)
      input.addData(first: _*)
      q.processAllAvailable()
      input.addData(second: _*)
      q.processAllAvailable()
      val out = spark.table("sh_clean_out")
      assert(out.columns.toSeq == Seq("doc_id", "text"))
      val got = out.collect().map(_.getLong(0)).toSeq
      assert(got.distinct.size == got.size, "clean docs must not repeat")
      assert(got.toSet == (allIds -- dupIds),
        s"${got.size} streamed vs ${(allIds -- dupIds).size} batch-clean")
      assert(dupIds.nonEmpty, "fixture must exercise the dup path")
    } finally q.stop()
  }

  test("cosineCleanStream: streamed clean set is the exact batch complement") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val ref = e.filter(col("vec_id") < 50)
    val nw = e.filter(col("vec_id") >= 50)
    def bucket = graft.ops.Similarity.lshBucket(
      col("embedding"), dim = 64, nBits = 4)
    // batch truth: the contaminated ids flagged by the semi-join form
    val contaminated = graft.ops.Dedup.cosineContaminated(
        nw, ref, "vec_id", "embedding", threshold = 0.3,
        bucketCol = bucket, roundDp = 6)
      .collect().map(_.getLong(0)).toSet
    val allIds = nw.select("vec_id").collect().map(_.getLong(0)).toSet
    val rows = nw.select(col("vec_id"),
        col("embedding").cast("array<double>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val input = MemoryStream[(Long, Seq[Double])]
    val stream = graft.ops.Dedup.cosineCleanStream(
      input.toDF().toDF("vec_id", "embedding"), ref,
      "embedding", threshold = 0.3, bucketCol = bucket, roundDp = 6)
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("cos_clean_out").start()
    try {
      val (first, second) = rows.splitAt(rows.length / 2)
      input.addData(first: _*)
      q.processAllAvailable()
      input.addData(second: _*)
      q.processAllAvailable()
      val out = spark.table("cos_clean_out")
      assert(out.columns.toSeq == Seq("vec_id", "embedding"))
      val got = out.collect().map(_.getLong(0)).toSeq
      assert(got.distinct.size == got.size, "clean docs must not repeat")
      assert(got.toSet == (allIds -- contaminated),
        s"${got.size} streamed vs ${(allIds -- contaminated).size} batch-clean")
      assert(contaminated.nonEmpty, "fixture must exercise the flagged path")
    } finally q.stop()
  }

  test("file-source stream with checkpoint + AvailableNow trigger matches q60 batch twin") {
    val dir = TestSpark.sf0001
    val batch = EventStream.tumblingCounts(Queries.eventsTbl(spark, dir))
      .orderBy("win_start", "event_type").collect()

    val rawSchema = EventStream.rawEventsSchema(spark, s"$dir/events.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("events_ckpt_src")
    val ckpt = java.nio.file.Files.createTempDirectory("events_ckpt_meta")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      tmp.resolve("events.parquet"))
    def run(): Unit = {
      val stream = spark.readStream.schema(rawSchema).parquet(tmp.toString)
        .transform(Queries.normalizeEventsTs)
      val q = EventStream.tumblingCountsStreaming(stream)
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt.toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("memory").queryName("tumbling_ckpt").start()
      try assert(q.awaitTermination(120000), "stream did not finish in 120s")
      finally q.stop()
    }
    run()
    val streamed = spark.table("tumbling_ckpt")
      .orderBy("win_start", "event_type").collect()
    assert(streamed.length == batch.length)
    assert(streamed.map(_.toString).sameElements(batch.map(_.toString)))
    // restart from the same checkpoint: no new data → no reprocessing crash
    run()
  }

  test("streaming parquet SINK: file-to-file pipeline round-trips (append mode)") {
    val dir = TestSpark.sf0001
    val rawSchema = EventStream.rawEventsSchema(spark, s"$dir/events.parquet")
    val src = java.nio.file.Files.createTempDirectory("events_sink_src")
    val out = java.nio.file.Files.createTempDirectory("events_sink_out")
    val ckpt = java.nio.file.Files.createTempDirectory("events_sink_ckpt")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      src.resolve("events.parquet"))
    // per-row projection pipeline (append-compatible): type-tagged value
    val stream = spark.readStream.schema(rawSchema).parquet(src.toString)
      .transform(Queries.normalizeEventsTs)
      .select(col("event_id"), col("event_type"),
        (col("value") * 2.0).as("value2"))
    val q = stream.writeStream
      .option("checkpointLocation", ckpt.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", out.toString).start()
    try assert(q.awaitTermination(120000), "sink stream did not finish")
    finally q.stop()
    val written = spark.read.parquet(out.toString)
    val expected = Queries.eventsTbl(spark, dir)
      .select(col("event_id"), col("event_type"), (col("value") * 2.0).as("value2"))
    assert(written.count() == expected.count())
    val a = written.agg(sum(col("value2"))).head().getDouble(0)
    val b = expected.agg(sum(col("value2"))).head().getDouble(0)
    assert(math.abs(a - b) < 1e-6, s"$a vs $b")
  }

  test("stateful streaming sessionize emits sessions matching the batch twin") {
    import spark.implicits._
    val dir = TestSpark.sf0001
    val rawSchema = EventStream.rawEventsSchema(spark, s"$dir/events.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("events_sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      tmp.resolve("events.parquet"))
    val stream = spark.readStream.schema(rawSchema).parquet(tmp.toString)
      .transform(Queries.normalizeEventsTs)
      .withColumn("tsUs", unix_micros(col("ts")))
      .select("event_id", "ts", "tsUs", "user_id", "event_type", "value")
      .as[graft.streaming.Event]
    val q = graft.streaming.EventStream.sessionizeStreaming(stream, gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sess_out")
        .select("user_id", "n_events", "start_us", "end_us")
        .collect().map(_.toString).toSet
      val batch = graft.streaming.EventStream
        .sessionizeBatch(graft.queries.Queries.eventsTbl(spark, dir), gapMinutes = 30)
        .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"))
        .collect().map(_.toString).toSet
      // append mode only emits sessions closed by the watermark; all of
      // them must agree with the batch gap-and-island result
      assert(streamed.nonEmpty)
      assert(streamed.subsetOf(batch),
        s"streamed-only sessions: ${streamed.diff(batch).take(3)}")
    } finally q.stop()
  }

  test("sessionize: late within-watermark event extends, never shrinks, a session") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, minute: Int): graft.streaming.Event = {
      val t = java.sql.Timestamp.valueOf(f"2020-01-01 10:$minute%02d:00")
      graft.streaming.Event(id, t, t.getTime * 1000L, 1L, "click", 1.0)
    }
    val input = MemoryStream[graft.streaming.Event]
    val q = graft.streaming.EventStream
      .sessionizeStreaming(input.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_late_out").start()
    try {
      // batch 1 establishes a session ending 10:20
      input.addData(ev(1, 0), ev(2, 20))
      q.processAllAvailable()
      // batch 2: a LATE event at 10:10 (within watermark) must merge
      // WITHOUT shrinking end back to 10:10; then 10:45 — 25 min from
      // the true end 10:20 — must still extend the same session (the
      // shrink bug would measure 35 min from 10:10 and wrongly split)
      input.addData(ev(3, 10), ev(4, 45))
      q.processAllAvailable()
      // push the watermark far past the session so it closes
      input.addData(ev(5, 130).copy(event_id = 5))
      q.processAllAvailable()
      input.addData(ev(6, 250))
      q.processAllAvailable()
      val out = spark.table("sess_late_out")
        .select("user_id", "n_events", "start_us", "end_us").collect()
      def us(minute: Int) =
        java.sql.Timestamp.valueOf(f"2020-01-01 10:$minute%02d:00").getTime * 1000L
      val first = out.find(_.getLong(2) == us(0))
      assert(first.isDefined, out.mkString(","))
      assert(first.get.getLong(1) == 4L, s"split session: ${first.get}") // 4 events, one session
      assert(first.get.getLong(3) == us(45), s"wrong end: ${first.get}")
      assert(out.forall(r => r.getLong(2) <= r.getLong(3)), "end < start emitted")
    } finally q.stop()
  }

  test("streamingTumblingCounts public path reads the events fixture directly") {
    // the convenience entry point must consume the SAME nanosecond-long
    // parquet layout its batch twin reads (a TimestampType schema here
    // fails the read) — drive it end-to-end against a staged fixture dir
    val dir = TestSpark.sf0001
    val tmp = java.nio.file.Files.createTempDirectory("events_pub")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      tmp.resolve("events.parquet"))
    val q = graft.streaming.EventStream
      .streamingTumblingCounts(spark, tmp.toString)
      .writeStream.outputMode("complete").format("memory")
      .queryName("pub_tumbling_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("pub_tumbling_out")
        .orderBy("win_start", "event_type").collect()
      val batch = graft.streaming.EventStream
        .tumblingCounts(graft.queries.Queries.eventsTbl(spark, dir))
        .orderBy("win_start", "event_type").collect()
      assert(streamed.length == batch.length)
      assert(streamed.map(_.toString).sameElements(batch.map(_.toString)))
    } finally q.stop()
  }

  test("watermark drops events later than the threshold (late-data path)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val agg = events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2020-01-01 10:$m%02d:00")
    try {
      input.addData((ts(0), "a", 1.0), (ts(1), "a", 1.0))
      q.processAllAvailable()
      // advance event time far past the first window + watermark → closes it
      input.addData((ts(30), "a", 1.0))
      q.processAllAvailable()
      val afterClose = spark.table("late_out").count()
      assert(afterClose >= 1) // [10:00,10:05) window emitted with n=2
      val closed = spark.table("late_out")
        .filter(col("event_type") === "a").agg(sum(col("n"))).head().getLong(0)
      assert(closed == 2)
      // a straggler inside the long-closed window must be DROPPED
      input.addData((ts(2), "a", 99.0))
      q.processAllAvailable()
      input.addData((ts(55), "a", 1.0)) // close everything else
      q.processAllAvailable()
      val total = spark.table("late_out").agg(sum(col("n"))).head().getLong(0)
      assert(total == 3, s"late event was not dropped (total=$total)") // 2 + 1(ts30), late 99 dropped, ts55 still open
    } finally q.stop()
  }

  test("streaming dedup within watermark suppresses duplicate ids, bounded state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val events = input.toDF().toDF("event_id", "ts", "value")
    val q = EventStream.streamingDedup(events, Seq("event_id"), "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2020-01-01 10:$m%02d:00")
    try {
      input.addData((1L, ts(0), 1.0), (1L, ts(1), 2.0), (2L, ts(1), 3.0))
      q.processAllAvailable()
      input.addData((1L, ts(2), 4.0)) // still within watermark → duplicate
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(ids == Seq(1L, 2L), ids.toString) // each id exactly once
    } finally q.stop()
  }

  test("sessionize: gap > 30min starts a new session") {
    import spark.implicits._
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2020-01-01 00:00:00"), 7L, "c", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2020-01-01 00:10:00"), 7L, "c", 1.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2020-01-01 01:00:00"), 7L, "c", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val sessions = EventStream.sessionizeBatch(events, gapMinutes = 30)
      .orderBy("session_seq").collect()
    assert(sessions.length == 2)
    assert(sessions(0).getLong(2) == 2) // first session has 2 events
    assert(sessions(1).getLong(2) == 1)
  }

  test("sessionize: NULL user_id / NULL ts rows drop instead of fabricating sessions") {
    // a NULL user_id window partition would gap-merge DISTINCT unknown
    // users into shared sessions; a NULL ts row would emit a degenerate
    // NULL-bound singleton — both now drop, matching the asOf/interval-
    // join convention on dirty keys/times
    import spark.implicits._
    val events = Seq(
      (1L, Option(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")), Option(7L)),
      (2L, Option(java.sql.Timestamp.valueOf("2020-01-01 00:10:00")), Option(7L)),
      (3L, Option(java.sql.Timestamp.valueOf("2020-01-01 00:05:00")), None),
      (4L, Option(java.sql.Timestamp.valueOf("2020-01-01 00:06:00")), None),
      (5L, None, Option(7L)))
      .toDF("event_id", "ts", "user_id")
    val sessions = EventStream.sessionizeBatch(events, gapMinutes = 30).collect()
    assert(sessions.length == 1, sessions.mkString(","))
    assert(sessions(0).getLong(0) == 7L && sessions(0).getLong(2) == 2)
  }

  test("hashSample/hashSplit run unchanged on a STREAM and match the batch pick") {
    // the payoff of the keyed md5 coin over df.sample()/randomSplit: the
    // decision is a stateless pure function of the key, so the SAME code
    // is streaming-compatible (no RNG state, no watermark) and a
    // streaming ingest keeps exactly the rows a batch backfill would
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ids = (1L to 400L)
    val batchDf = ids.toDF("doc_id")
    val batchKept = graft.ops.Sampling.hashSample(batchDf, col("doc_id"), 0.3, 11L)
      .collect().map(_.getLong(0)).toSet
    val batchSplit0 = graft.ops.Sampling.hashSplit(
      batchDf, Array(0.4, 0.6), col("doc_id"), 11L)(0)
      .collect().map(_.getLong(0)).toSet

    val in = MemoryStream[Long]
    val stream = in.toDF().toDF("doc_id")
    val sampled = graft.ops.Sampling.hashSample(stream, col("doc_id"), 0.3, 11L)
    val split0 = graft.ops.Sampling.hashSplit(
      stream, Array(0.4, 0.6), col("doc_id"), 11L)(0)
    val q1 = sampled.writeStream.outputMode("append")
      .format("memory").queryName("hs_out").start()
    val q2 = split0.writeStream.outputMode("append")
      .format("memory").queryName("hsp_out").start()
    try {
      // two arrivals of the same ids (a re-delivered shard): the keyed
      // coin gives every row the same fate on each arrival
      in.addData(ids: _*)
      in.addData(ids.take(100): _*)
      q1.processAllAvailable(); q2.processAllAvailable()
      val streamKept = spark.table("hs_out").collect().map(_.getLong(0))
      assert(streamKept.toSet == batchKept)
      // re-delivered rows got the identical verdict (dupes allowed, set equal)
      assert(streamKept.count(_ <= 100) ==
        2 * batchKept.count(_ <= 100))
      val streamSplit0 = spark.table("hsp_out").collect().map(_.getLong(0)).toSet
      assert(streamSplit0 == batchSplit0)
    } finally { q1.stop(); q2.stop() }
  }

  test("normalizeEventsTs: both fixture encodings land on identical micros") {
    import spark.implicits._
    // legacy encoding: TIMESTAMP(NANOS) parquet read as a raw ns long
    val ns = Seq((1L, 1700000000123456789L)).toDF("event_id", "ts")
    val a = Queries.normalizeEventsTs(ns)
      .select(unix_micros(col("ts"))).head().getLong(0)
    assert(a == 1700000000123456L, a.toString)
    // current encoding: TIMESTAMP(MICROS) parquet read as TIMESTAMP_NTZ
    // (session TZ is UTC, so the re-tag preserves the stored micros)
    val ntz = ns.select(col("event_id"),
      timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz").as("ts"))
    assert(ntz.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val b = Queries.normalizeEventsTs(ntz)
      .select(unix_micros(col("ts"))).head().getLong(0)
    assert(b == a, s"$b vs $a")
    // an already-normalized frame passes through; anything else fails
    // loudly instead of windowing garbage
    val tz = Queries.normalizeEventsTs(ntz)
    assert(Queries.normalizeEventsTs(tz).schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val err = intercept[IllegalArgumentException] {
      Queries.normalizeEventsTs(Seq((1L, "x")).toDF("event_id", "ts"))
    }
    assert(err.getMessage.contains("events.ts"), err.getMessage)
  }
}
