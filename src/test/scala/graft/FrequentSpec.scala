package graft

import graft.ops.Frequent
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact heavy hitters (ops.Frequent): result equals brute force on
  * skewed multi-partition data, the Misra–Gries no-false-negative
  * guarantee at tight supports, the summary's cap/undercount mechanics,
  * and input validation. Cross-engine exactness is q129's oracle. */
class FrequentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish corpus: item i appears ~N/(i+1) times, shuffled across
    * partitions so per-partition summaries disagree before merging. */
  private def zipf(nItems: Int, scale: Int, parts: Int) = {
    val rows = (0 until nItems).flatMap(i =>
      Seq.fill(math.max(scale / (i + 1), 1))(s"w$i"))
    val shuffled = new scala.util.Random(7).shuffle(rows)
    spark.sparkContext.parallelize(shuffled, parts).toDF("item")
  }

  private def brute(df: org.apache.spark.sql.DataFrame, num: Long, den: Long) = {
    val rows = df.filter($"item".isNotNull).groupBy("item").count().collect()
    val n = rows.map(_.getLong(1)).sum
    rows.filter(r => r.getLong(1) * den >= n * num)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("matches brute force exactly on skewed multi-partition data") {
    val df = zipf(nItems = 400, scale = 5000, parts = 13)
    for ((num, den) <- Seq((1L, 100L), (1L, 500L), (3L, 1000L))) {
      val got = Frequent.frequentItems(df, $"item", num, den)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === brute(df, num, den), s"support $num/$den")
    }
  }

  test("tight support with vocabulary far above the sketch still exact") {
    // 5000 distinct items, sketch floor ~334 counters: candidates are
    // heavily pruned yet every true heavy hitter must survive
    val df = zipf(nItems = 5000, scale = 2000, parts = 8)
    val got = Frequent.frequentItems(df, $"item", 3L, 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === brute(df, 3L, 1000L))
    assert(got.nonEmpty)
  }

  test("nulls are ignored; all-null and empty inputs yield empty results") {
    val df = Seq(Some("a"), Some("a"), Some("a"), None, Some("b"))
      .toDF("item")
    val got = Frequent.frequentItems(df, $"item", 1L, 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n = 4 non-null; a: 3 >= 2 passes, b: 1 < 2 drops
    assert(got === Map("a" -> 3L))
    val allNull = Seq(None: Option[String], None).toDF("item")
    assert(Frequent.frequentItems(allNull, $"item", 1L, 2L).count() === 0)
    assert(Frequent.frequentItems(allNull.limit(0), $"item", 1L, 2L).count() === 0)
  }

  test("validation: support range, long-range den, string-only items") {
    val df = Seq("a").toDF("item")
    intercept[IllegalArgumentException] {
      Frequent.frequentItems(df, $"item", 0L, 5L)
    }
    intercept[IllegalArgumentException] {
      Frequent.frequentItems(df, $"item", 5L, 5L)
    }
    intercept[IllegalArgumentException] {
      Frequent.frequentItems(df, $"item", 1L, 2000000L)
    }
    val ints = Seq(1, 2, 2).toDF("item")
    intercept[IllegalArgumentException] {
      Frequent.frequentItems(ints, $"item", 1L, 2L)
    }
  }

  test("topK: certified prefix equals brute force; flat corpora fail loudly with a remedy") {
    val df = zipf(nItems = 2000, scale = 3000, parts = 9)
    val got = Frequent.topK(df, $"item", k = 10, sketchSize = 1024)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val bruteTop = df.filter($"item".isNotNull).groupBy("item").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (i, c) => (-c, i) }.take(10).toSeq
    assert(got === bruteTop)
    // a flat corpus (every item once) cannot certify any top-k at a
    // sketch narrower than the vocabulary — must fail with the width fix
    val flat = (0 until 5000).map(i => s"u$i").toDF("item").repartition(5)
    val e = intercept[IllegalStateException] {
      Frequent.topK(flat, $"item", k = 10, sketchSize = 256)
    }
    assert(e.getMessage.contains("sketchSize >="), e.getMessage)
    // bound == 0 (sketch at least the vocabulary): exact even when the
    // vocabulary is smaller than k
    val tiny = Seq("a", "a", "b").toDF("item")
    val t = Frequent.topK(tiny, $"item", k = 10, sketchSize = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(t === Seq(("a", 2L), ("b", 1L)))
  }

  test("MgSummary: cap holds, heavy item keeps positive count through merges") {
    val k = 10
    val parts = (0 until 20).map { p =>
      val s = new Frequent.MgSummary(k)
      // each partition: 50 occurrences of HEAVY + 40 distinct singletons
      (0 until 50).foreach(_ => s.add("HEAVY"))
      (0 until 40).foreach(i => s.add(s"p${p}_$i"))
      assert(s.size <= k)
      s
    }
    val merged = parts.reduce { (a, b) => a.merge(b); a }
    assert(merged.size <= k)
    // HEAVY has frequency 1000/1800 > n/(k+1): guaranteed present
    assert(merged.keys.contains("HEAVY"))
  }

  test("MgSummary invariant: no zero-valued counter survives any add/merge sequence") {
    // the `add` fast path (`cur != 0L` proves presence) relies on zeros
    // being evicted at every decrement/merge — drive randomized
    // adversarial sequences and check the invariant after each step
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 50) {
      val k = 1 + rnd.nextInt(8)
      val s = new Frequent.MgSummary(k)
      for (_ <- 0 until 300) {
        if (rnd.nextInt(10) < 8) {
          // skewed draws force both the hit path and decrementAll
          s.add(s"w${rnd.nextInt(3 + rnd.nextInt(4 * k))}")
        } else {
          val o = new Frequent.MgSummary(k)
          (0 until rnd.nextInt(30)).foreach(_ =>
            o.add(s"m${rnd.nextInt(3 * k)}"))
          s.merge(o)
        }
        assert(s.countersAllPositive && s.size <= k,
          s"trial=$trial k=$k violated the positive-counter/cap invariant")
      }
    }
  }
}
