package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Exact frequent-items (heavy hitters) above a support threshold, at
  * sketch cost: a one-pass mergeable Misra–Gries summary proposes a
  * GUARANTEED superset of every item with frequency ≥ n·num/den, then
  * one bounded recount makes the output exact. The vocabulary-scale
  * answer to "which tokens/domains/shingles dominate this corpus" —
  * corpus-statistics scope the reference lacks (north star; SURVEY §2
  * addendum).
  *
  * Why not plain `groupBy(item).count().filter(...)`: that shuffles the
  * FULL distinct-item space (at 100 TB of text, billions of distinct
  * tokens — the aggregation state and the exchange are both
  * vocabulary-sized). Here the full-vocabulary aggregation never
  * happens:
  *
  *  1. Scan 1 — `treeAggregate` of per-partition Misra–Gries summaries
  *     (≤ `sketchSize` counters each, merged pairwise with the same cap
  *     — the mergeable-summaries construction of Agarwal et al. 2012,
  *     PODS; undercount after any merge sequence ≤ n/(k+1)). Driver
  *     state is O(k), the scan shuffles NOTHING (aggregate only).
  *  2. Scan 2 — broadcast inner join against the ≤ k candidates, then
  *     an exact count whose aggregation state is bounded by k, and the
  *     integer threshold `cnt·den ≥ n·num`.
  *
  * Correctness: `sketchSize` ≥ den/num makes k+1 > den/num, so any item
  * with true frequency ≥ n·num/den has positive Misra–Gries count and
  * survives scan 1 (no false negatives); scan 2's exact recount removes
  * every false positive. The result is therefore EXACTLY the
  * brute-force answer — counts are longs and the threshold is integer
  * arithmetic, so the q129 DuckDB oracle hash-matches bit-for-bit.
  *
  * NULL items are ignored (a null token is absence, not a countable
  * value — the `count(col)` SQL convention).
  */
object Frequent {

  /** Items with `cnt ≥ n · num/den` (n = non-null item count), as
    * `(item string, cnt long)` — exact counts, unordered (callers add
    * their own total order). `sketchSize` tunes candidate precision;
    * the floor that preserves the no-false-negative guarantee is
    * imposed automatically. */
  def frequentItems(df: DataFrame, itemCol: Column, num: Long, den: Long,
      sketchSize: Int = 0): DataFrame = {
    require(num >= 1 && den > num,
      s"support must satisfy 1 <= num < den, got $num/$den")
    require(den <= 1000000L,
      s"den must be <= 1e6 (threshold arithmetic stays in Long range " +
        s"for corpora up to ~9e12 items), got $den")
    val items = df.select(itemCol.as("item"))
    require(items.schema("item").dataType == StringType,
      s"frequentItems: item column must be string, got " +
        s"${items.schema("item").dataType.simpleString} — cast explicitly " +
        "(string equality is the counting key)")
    val spark = items.sparkSession
    import spark.implicits._
    val floor = (den / num + 1).toInt
    val k = math.max(sketchSize, floor)

    // Scan 1: count + Misra–Gries candidates, one treeAggregate. The
    // summaries are mutable inside a task (each task deserializes its
    // own zero) and merged with the k-cap at every tree level, so no
    // JVM ever holds more than a few·k counters.
    val ds = items.filter($"item".isNotNull).as[String]
    val (n, summary) = ds.rdd.treeAggregate((0L, new MgSummary(k)))(
      seqOp = { case ((c, s), item) => s.add(item); (c + 1L, s) },
      combOp = { case ((c1, s1), (c2, s2)) => s1.merge(s2); (c1 + c2, s1) },
      depth = 2)
    val candidates = summary.keys
    if (candidates.isEmpty || n == 0L) {
      spark.emptyDataset[(String, Long)].toDF("item", "cnt")
    } else {
      // Scan 2: exact recount of the bounded candidate set. The join is
      // a broadcast of ≤ k strings; aggregation state is ≤ k rows.
      val candDf = candidates.toSeq.toDF("item")
      items.join(broadcast(candDf), Seq("item"))
        .groupBy("item").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * lit(den) >= lit(n) * lit(num))
    }
  }

  /** CERTIFIED exact top-`k` most frequent items, `(item, cnt)` ordered
    * by (cnt DESC, item ASC), at the same sketch cost as
    * [[frequentItems]]. The Misra–Gries undercount bound doubles as a
    * proof obligation: any item NOT among the sketch's candidates has
    * true count ≤ ⌊n/(sketchSize+1)⌋, so when the exact k-th candidate
    * count strictly exceeds that bound, no non-candidate can reach the
    * top k (or even tie its boundary) — the recounted candidate prefix
    * IS the exact answer. If the bound cannot be certified (the corpus
    * is too flat for the sketch width) the call FAILS LOUDLY with the
    * minimum sufficient width rather than returning a silently
    * approximate ranking. Eager (it must inspect the k-th count to
    * certify) — the bounded model-build discipline of [[CharLm.fit]]. */
  def topK(df: DataFrame, itemCol: Column, k: Int,
      sketchSize: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(sketchSize >= k,
      s"sketchSize ($sketchSize) must be >= k ($k)")
    val items = df.select(itemCol.as("item"))
    require(items.schema("item").dataType == StringType,
      s"topK: item column must be string, got " +
        s"${items.schema("item").dataType.simpleString} — cast explicitly")
    val spark = items.sparkSession
    import spark.implicits._
    val ds = items.filter($"item".isNotNull).as[String]
    val (n, summary) = ds.rdd.treeAggregate((0L, new MgSummary(sketchSize)))(
      seqOp = { case ((c, s), item) => s.add(item); (c + 1L, s) },
      combOp = { case ((c1, s1), (c2, s2)) => s1.merge(s2); (c1 + c2, s1) },
      depth = 2)
    val candidates = summary.keys
    if (n == 0L) {
      spark.emptyDataset[(String, Long)].toDF("item", "cnt")
    } else {
      val candDf = candidates.toSeq.toDF("item")
      val recounted = items.join(broadcast(candDf), Seq("item"))
        .groupBy("item").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("item").asc)
        .limit(k)
      val top = recounted.collect() // ≤ k rows — the certification read
      val bound = n / (sketchSize + 1)
      // two certifiable shapes: a full k-prefix whose boundary count
      // strictly beats the worst-case non-candidate (no outsider can
      // reach OR tie rank k), or bound == 0 (no eviction was possible,
      // the candidates ARE the whole vocabulary — exact even when the
      // vocabulary holds fewer than k items)
      val certified =
        (top.length == k && top.last.getLong(1) > bound) || bound == 0L
      if (!certified) {
        val kth = if (top.isEmpty) 1L else math.max(top.last.getLong(1), 1L)
        // minimum width w with n/(w+1) < kth  ⇔  w+1 > n/kth; computed in
        // Long and clamped — at corpus scale n/kth can exceed Int range,
        // and a truncated recommendation would be negative garbage
        val needed = math.min(n / kth + 1L, Int.MaxValue.toLong)
        throw new IllegalStateException(
          s"topK: cannot certify exactness — the rank-${top.length} count " +
            s"${if (top.isEmpty) "(none)" else top.last.getLong(1).toString} " +
            s"does not strictly exceed the sketch undercount bound $bound " +
            s"(= n/(sketchSize+1)); re-run with sketchSize >= $needed")
      }
      top.map(r => (r.getString(0), r.getLong(1))).toSeq.toDF("item", "cnt")
    }
  }

  /** Mergeable Misra–Gries summary, ≤ `k` counters. `add` is the
    * classic per-item update (decrement-all on overflow, amortized O(1)
    * via the shared-decrement counter); `merge` adds counts then
    * re-caps by subtracting the (k+1)-th largest (Agarwal et al. 2012
    * §3.1). Undercount of any item after any add/merge tree ≤ n/(k+1),
    * hence every item with frequency > n/(k+1) keeps a positive count. */
  private[graft] final class MgSummary(k: Int) extends Serializable {
    require(k >= 1, s"sketch size must be >= 1, got $k")
    private val m = new java.util.HashMap[String, Long](k * 2)

    def add(item: String): Unit = {
      val cur = m.get(item)
      // `m.get` returns 0L for an ABSENT key, but a PRESENT key can never
      // map to 0L (decrementAll and merge both evict zeros — the class
      // invariant countersAllPositive pins), so `cur != 0L` alone proves
      // presence; the containsKey call only breaks the 0-vs-absent tie
      // and is reached only on the miss path.
      if (cur != 0L || m.containsKey(item)) m.put(item, cur + 1L)
      else if (m.size < k) m.put(item, 1L)
      else decrementAll()
    }

    /** Class invariant, test-visible: no stored counter is ever zero or
      * negative (zeros are evicted at every decrement/merge). The `add`
      * fast path relies on it. */
    private[graft] def countersAllPositive: Boolean = {
      var ok = true
      m.forEach { (_, c) => if (c <= 0L) ok = false }
      ok
    }

    /** The overflow step: all counters drop by one, zeros evicted —
      * equivalent to not inserting the new item and charging one unit
      * of undercount to everyone (including it). */
    private def decrementAll(): Unit = {
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }

    def merge(other: MgSummary): Unit = {
      other.m.forEach { (item, c) =>
        val cur = m.get(item)
        m.put(item, cur + c)
      }
      if (m.size > k) {
        // subtract the (k+1)-th largest count from every counter; at
        // most k survive (those strictly above it)
        val counts = new Array[Long](m.size)
        var i = 0
        m.forEach { (_, c) => counts(i) = c; i += 1 }
        java.util.Arrays.sort(counts)
        val cut = counts(counts.length - k - 1)
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
        }
      }
    }

    def keys: Array[String] = {
      val out = new Array[String](m.size)
      var i = 0
      m.forEach { (item, _) => out(i) = item; i += 1 }
      out
    }

    private[graft] def size: Int = m.size
  }
}
