package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup + similarity module behavior: exact dedup semantics, LSH recall
  * against the brute-force baseline, IVF training/probing. */
class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("exact dedup keeps one row per duplicate group") {
    import spark.implicits._
    val df = Seq(
      (1L, "hello world"), (2L, "hello world"), (3L, "unique text"),
      (4L, "hello world"), (5L, "other"))
      .toDF("id", "text")
    val out = Dedup.exact(df, "id", Seq("text")).orderBy("id")
    assert(out.count() == 3)
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L, 3L, 5L))
    assert(out.filter(col("id") === 1).select("n_copies").head().getLong(0) == 3)
  }

  test("minhash candidates find a true near-duplicate pair") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val far = "completely different words nothing shared here at all whatsoever zzz"
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "text")
    val cands = Dedup.minhashCandidates(df, "id", "text")
    val verified = Dedup.jaccardVerify(df, cands, "id", "text", threshold = 0.5)
      .collect()
    assert(verified.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!verified.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  test("simhash: near-identical docs land within small hamming distance") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    val far = "one two three four five six seven eight nine ten eleven twelve " * 5
    val df = Seq((1L, base), (2L, base + "lambda"), (3L, far))
      .toDF("id", "text")
    val sh = Dedup.simhash(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // with a tiny vocab many per-bit votes tie, so adding one token can
    // legitimately flip a few bits — assert the relative ordering only
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)),
      s"near=${ham(sh(1L), sh(2L))} far=${ham(sh(1L), sh(3L))}")
  }

  test("LSH top-k recall vs brute force is reasonable on real embeddings") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 10)
    val corpus = e.filter(col("vec_id") >= 10)
    val exact = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 5)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(corpus, queries, "vec_id", "embedding",
      dim = 64, k = 5, nBits = 2)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall=$recall") // 2-bit buckets = 1/4 of corpus probed
  }

  test("IVF centroids train and probe returns neighbors from own cell") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val centroids = Similarity.trainIvfCentroids(e, "embedding", kCells = 4, iters = 3)
    assert(centroids.length == 4 && centroids.forall(_.length == 64))
    val queries = e.filter(col("vec_id") < 5)
    val out = Similarity.ivfTopK(e.filter(col("vec_id") >= 5), queries,
      "vec_id", "embedding", centroids, k = 3)
    assert(out.groupBy("q_id").count().collect().forall(_.getLong(1) <= 3))
    assert(out.count() > 0)
  }

  test("as-of join: inclusive at equal time, latest prior match, unmatched dropped") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val trades = Seq(
      (1L, 10L, ts("2020-01-01 10:00:05")),
      (2L, 10L, ts("2020-01-01 10:00:10")), // exactly at quote q2 time
      (3L, 10L, ts("2020-01-01 09:00:00")), // before any quote → dropped
      (4L, 20L, ts("2020-01-01 10:00:07")))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (10L, ts("2020-01-01 10:00:00"), 100.0),
      (10L, ts("2020-01-01 10:00:10"), 101.0),
      (20L, ts("2020-01-01 10:00:06"), 55.0))
      .toDF("qsym", "qt", "price")
    val out = graft.ops.AsOfJoin.asOf(trades, quotes, "sym", "qsym", "t", "qt",
        Seq("price"))
      .orderBy("trade_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    assert(out(0).getDouble(3) == 100.0) // trade 1 → 10:00:00 quote
    assert(out(1).getDouble(3) == 101.0) // trade 2 → inclusive 10:00:10 quote
    assert(out(2).getDouble(3) == 55.0)
  }

  test("cosine near-dups within LSH buckets") {
    val e = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val bucket = Similarity.lshBucket(col("embedding"), dim = 64, nBits = 2)
    val pairs = Dedup.cosineNearDups(e, "vec_id", "embedding",
      threshold = 0.5, bucketCol = bucket)
    // symmetric/no self pairs; all above threshold
    val rows = pairs.collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getDouble(2) >= 0.5))
  }
}
