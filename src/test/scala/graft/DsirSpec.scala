package graft

import graft.ops.Dsir
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance resampling (ops.Dsir, arXiv:2302.03169): feature
  * extraction, the driver-side fit formula against a brute-force replay,
  * score linearity, top-k selection, and the hash-Gumbel sampler's
  * determinism/limit contracts. The cross-engine exactness of the full
  * pipeline is the q125/q126 DuckDB oracle's job; this suite pins the
  * pieces the oracle can't isolate. */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val B = 64

  /** Driver-side replay of the documented feature walk, hashing with the
    * same md5-u32 primitive but INDEPENDENT code (java.math.BigInteger
    * over the hex digest, not the kernel's byte arithmetic). */
  private def bruteFeatures(text: String): Seq[Int] = {
    def bucket(f: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 8), 16) % B).toInt
    }
    val toks = text.toLowerCase.split(" +", -1)
    toks.map(t => bucket("u:" + t)).toSeq ++
      toks.sliding(2).filter(_.length == 2).map(p => bucket("b:" + p(0) + " " + p(1)))
  }

  private val corpus = Seq(
    (0L, "the quick brown fox", "tgt"),
    (1L, "the quick brown fox jumps", "tgt"),
    (2L, "slow green turtle walks home", "raw"),
    (3L, "the quick brown fox runs", "raw"),
    (4L, "completely unrelated payload tokens here", "raw"),
    (5L, "", "raw")
  ).toDF("doc_id", "text", "grp")

  private def counts(f: org.apache.spark.sql.DataFrame) =
    Dsir.featureCounts(f, "text", B)

  test("featureCounts matches the brute-force feature walk") {
    val got = counts(corpus).collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = corpus.collect().flatMap(r => bruteFeatures(r.getString(1)))
      .groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    assert(got === want)
    // total features = sum over docs of 2*tokens - 1
    assert(got.values.sum ===
      corpus.collect().map(r => 2L * r.getString(1).split(" +", -1).length - 1).sum)
  }

  test("HashedNgramCounts accumulates the same walk HashedNgramBuckets lists") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val counts = corpus.select(ColumnBridge.column(
        graft.functions.HashedNgramCounts(
          ColumnBridge.expression(lower($"text")), B)).as("v"),
        $"text")
      .collect()
    counts.foreach { r =>
      val v = r.getSeq[Double](0)
      assert(v.length === B)
      val want = new Array[Double](B)
      bruteFeatures(r.getString(1)).foreach(b => want(b) += 1.0)
      assert(v === want.toSeq, r.getString(1))
    }
  }

  test("fit reproduces the documented nanonat ratio formula") {
    val tgt = corpus.filter($"grp" === "tgt")
    val model = Dsir.fit(counts(tgt), counts(corpus), B)
    assert(model.numBuckets === B)
    val ct = new Array[Long](B); val cr = new Array[Long](B)
    tgt.collect().flatMap(r => bruteFeatures(r.getString(1)))
      .foreach(b => ct(b) += 1)
    corpus.collect().flatMap(r => bruteFeatures(r.getString(1)))
      .foreach(b => cr(b) += 1)
    def nano(x: Double): Long = {
      val y = math.log(x) * 1e9
      (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
    }
    val want = Array.tabulate(B)(b =>
      nano((ct(b) + 1.0) / (ct.sum + B)) - nano((cr(b) + 1.0) / (cr.sum + B)))
    assert(model.ratioNano.toSeq === want.toSeq)
  }

  test("fitOnCorpus (one shared scan) equals fit over separate counting scans") {
    val byPredicate = Dsir.fitOnCorpus(corpus, $"grp" === "tgt", "text", B)
    val byTwoScans = Dsir.fit(
      counts(corpus.filter($"grp" === "tgt")), counts(corpus), B)
    assert(byPredicate.ratioNano.toSeq === byTwoScans.ratioNano.toSeq)
    // empty target predicate: same smoothed-constant degenerate model
    val emptyP = Dsir.fitOnCorpus(corpus, $"grp" === "nope", "text", B)
    val emptyS = Dsir.fit(counts(corpus.filter($"grp" === "nope")), counts(corpus), B)
    assert(emptyP.ratioNano.toSeq === emptyS.ratioNano.toSeq)
  }

  test("score sums the ratio table over the feature walk; empty text scores its one empty-unigram") {
    val model = Dsir.fit(counts(corpus.filter($"grp" === "tgt")), counts(corpus), B)
    val rows = Dsir.score(corpus, model).orderBy("doc_id").collect()
    corpus.orderBy("doc_id").collect().zip(rows).foreach { case (in, out) =>
      val feats = bruteFeatures(in.getString(1))
      assert(out.getAs[Int]("n_feats") === feats.length)
      assert(out.getAs[Long]("lr_nano") === feats.map(model.ratioNano(_)).sum)
    }
    // the empty doc has exactly one feature: the "" unigram
    assert(rows.find(_.getLong(0) == 5L).get.getAs[Int]("n_feats") === 1)
  }

  test("target-slice documents outscore out-of-domain ones") {
    val model = Dsir.fit(counts(corpus.filter($"grp" === "tgt")), counts(corpus), B)
    val s = Dsir.score(corpus, model).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("lr_nano")).toMap
    // doc 3 shares almost all features with the target; doc 4 shares none
    assert(s(3L) > s(4L))
  }

  test("selectTopK is the (lr desc, id asc) prefix") {
    val model = Dsir.fit(counts(corpus.filter($"grp" === "tgt")), counts(corpus), B)
    val scored = Dsir.score(corpus, model).select("doc_id", "lr_nano")
    val top3 = Dsir.selectTopK(scored, 3).collect().map(_.getLong(0)).toSeq
    val want = scored.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, lr) => (-lr, id) }.take(3).map(_._1).toSeq
    assert(top3 === want)
  }

  test("gumbelTopK: rerun-stable, seed-sensitive, and τ→0 recovers selectTopK") {
    val model = Dsir.fit(counts(corpus.filter($"grp" === "tgt")), counts(corpus), B)
    val scored = Dsir.score(corpus, model).select("doc_id", "lr_nano")
    val a = Dsir.gumbelTopK(scored, 3, seed = 1L).collect().map(_.getLong(0)).toSet
    val b = Dsir.gumbelTopK(scored, 3, seed = 1L).collect().map(_.getLong(0)).toSet
    assert(a === b)
    // across many seeds the most target-like doc appears more often than
    // the least (statistical, margin generous)
    val best = Dsir.selectTopK(scored, 1).collect().head.getLong(0)
    val worst = scored.orderBy($"lr_nano".asc, $"doc_id".asc)
      .limit(1).collect().head.getLong(0)
    val seeds = (1L to 30L)
    val hitsBest = seeds.count(s =>
      Dsir.gumbelTopK(scored, 2, seed = s, temperature = 1.0)
        .collect().map(_.getLong(0)).contains(best))
    val hitsWorst = seeds.count(s =>
      Dsir.gumbelTopK(scored, 2, seed = s, temperature = 1.0)
        .collect().map(_.getLong(0)).contains(worst))
    assert(hitsBest >= hitsWorst)
    // τ → 0: weights diverge, the sample is exactly the top-k
    val cold = Dsir.gumbelTopK(scored, 3, temperature = 1e-9, seed = 5L)
      .collect().map(_.getLong(0)).toSet
    val det = Dsir.selectTopK(scored, 3).collect().map(_.getLong(0)).toSet
    assert(cold === det)
    // the scratch column is reserved — an input already carrying it
    // would be silently clobbered and dropped, so it fails fast
    intercept[IllegalArgumentException] {
      Dsir.gumbelTopK(scored.withColumn("__gumbel",
        org.apache.spark.sql.functions.lit(0.0)), 3)
    }
  }

  test("gumbelTopK matches the documented construction exactly; top-1 frequencies track the weights") {
    // driver replay of the documented key: u = (hashU32(seed,id)+0.5)/2^32,
    // key = lr/1e9/τ − ln(−ln u) — same JVM, so doubles are bit-equal
    def u32(seed: Long, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$seed:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    def key(seed: Long, id: Long, lr: Long, tau: Double): Double =
      lr.toDouble / 1e9 / tau - math.log(-math.log((u32(seed, id) + 0.5) / 4294967296.0))
    val scored = Seq((1L, 0L), (2L, -700000000L), (3L, -1100000000L))
      .toDF("doc_id", "lr_nano")
    for (seed <- Seq(3L, 4L, 5L)) {
      val got = Dsir.gumbelTopK(scored, 2, seed = seed)
        .collect().map(_.getLong(0)).toSet
      val want = Seq(1L, 2L, 3L)
        .map(id => id -> key(seed, id,
          Map(1L -> 0L, 2L -> -700000000L, 3L -> -1100000000L)(id), 1.0))
        .sortBy { case (id, k) => (-k, id) }.take(2).map(_._1).toSet
      assert(got === want, s"seed $seed")
    }
    // distributional property of the construction (driver-side, the
    // Spark form is exact-equal above): P(top-1 = i) = w_i/Σw with
    // w = exp(lr/1e9). lr 0 / −0.7e9 / −1.1e9 ⇒ w ≈ 1/0.497/0.333 ⇒
    // p ≈ 0.546/0.271/0.182. 600 seeds: 3σ ≈ 0.061.
    val lrs = Map(1L -> 0L, 2L -> -700000000L, 3L -> -1100000000L)
    val wins = (1L to 600L).map { seed =>
      lrs.keys.maxBy(id => key(seed, id, lrs(id), 1.0))
    }.groupBy(identity).map { case (id, xs) => id -> xs.size / 600.0 }
    assert(math.abs(wins(1L) - 0.546) < 0.062, wins.toString)
    assert(math.abs(wins(2L) - 0.271) < 0.062, wins.toString)
    assert(math.abs(wins(3L) - 0.182) < 0.062, wins.toString)
  }

  test("fit fail-fast: foreign buckets, bad counts, duplicate buckets") {
    val bad = Seq((B + 5, 3L)).toDF("bucket", "c")
    intercept[IllegalArgumentException] { Dsir.fit(bad, bad, B) }
    val neg = Seq((1, 0L)).toDF("bucket", "c")
    intercept[IllegalArgumentException] { Dsir.fit(neg, neg, B) }
    val dup = Seq((1, 2L), (1, 4L)).toDF("bucket", "c")
    intercept[IllegalArgumentException] { Dsir.fit(dup, dup, B) }
    val nul = Seq((Some(1), None: Option[Long])).toDF("bucket", "c")
    intercept[IllegalArgumentException] { Dsir.fit(nul, nul, B) }
  }

  test("empty target slice fits (smoothed-constant model) instead of crashing") {
    val model = Dsir.fit(counts(corpus.filter($"grp" === "nope")), counts(corpus), B)
    // ratio differences come only from the raw side now: buckets the raw
    // corpus uses are DOWNweighted relative to untouched buckets
    assert(model.ratioNano.distinct.length > 1)
    val scored = Dsir.score(corpus, model)
    assert(scored.count() === 6)
  }

  test("qualityCleanStream micro-batches admit exactly the batch score+filter complement") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .filter($"doc_id" < 120)
    val model = Dsir.fit(
      counts(docs.filter($"source" === "src3")), counts(docs), B)
    // cut at the empirical median so the filter always bites regardless
    // of how the B=64 collision structure flattens the scores
    val scores = Dsir.score(docs, model).select("doc_id", "lr_nano")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val cut = scores.map(_._2).sorted.apply(scores.length / 2)
    val batchKeep = scores.filter(_._2 >= cut).map(_._1).toSet
    assert(batchKeep.nonEmpty && batchKeep.size < scores.length) // the cut bites
    val bc = spark.sparkContext.broadcast(model.ratioNano)
    val in = MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
    val q = Dsir.qualityCleanStream(stream, bc, minLrNano = cut)
      .writeStream.outputMode("append").format("memory")
      .queryName("dsir_clean_out").start()
    try {
      val rows = docs.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      // two micro-batches: stateless filter must not care about batching
      in.addData(rows.take(60).toSeq: _*)
      q.processAllAvailable()
      in.addData(rows.drop(60).toSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("dsir_clean_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed === batchKeep)
      // admitted docs keep their full schema
      assert(spark.table("dsir_clean_out").columns.toSeq === Seq("doc_id", "text"))
    } finally q.stop()
    intercept[IllegalArgumentException] {
      Dsir.qualityCleanStream(docs.withColumn("__lr_nano", lit(1L)), bc, cut)
    }
  }

  test("persisted featureCounts round-trip fits the identical model") {
    val dir = java.nio.file.Files.createTempDirectory("dsir_counts").toString
    counts(corpus.filter($"grp" === "tgt")).write.parquet(s"$dir/tgt")
    counts(corpus).write.parquet(s"$dir/raw")
    val live = Dsir.fit(counts(corpus.filter($"grp" === "tgt")), counts(corpus), B)
    val reread = Dsir.fit(
      spark.read.parquet(s"$dir/tgt"), spark.read.parquet(s"$dir/raw"), B)
    assert(live.ratioNano.toSeq === reread.ratioNano.toSeq)
  }

  test("score fail-fast on reserved output columns; null text scores null") {
    val model = Dsir.fit(counts(corpus), counts(corpus), B)
    val clash = corpus.withColumn("lr_nano", lit(1L))
    intercept[IllegalArgumentException] { Dsir.score(clash, model) }
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(9L, null: String))),
      new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long").add("text", "string"))
    val r = Dsir.score(withNull, model).collect().head
    assert(r.isNullAt(r.fieldIndex("lr_nano")) && r.isNullAt(r.fieldIndex("n_feats")))
  }
}
