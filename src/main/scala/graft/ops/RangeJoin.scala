package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) joins — Spark-first shapes for the two regimes:
  *
  *  1. small range side → broadcast + conditional join (q63 uses this;
  *     one scan of the fact side, zero shuffle of it);
  *  2. range-vs-range at scale → fixed-width BUCKETING (this file): each
  *     interval explodes to the buckets it covers, both sides shuffle on
  *     the bucket key, and the exact overlap predicate runs only within
  *     a bucket. Pairwise work drops from O(n·m) to Σ_b n_b·m_b, the
  *     standard distributed interval-join idiom.
  *
  * Duplicate suppression is arithmetic, not a distinct: a pair spanning
  * several shared buckets is emitted only in the FIRST overlapping bucket
  * (bucket == ⌊max(lo₁,lo₂)/w⌋), so no second dedup shuffle is needed —
  * at 100 TB a post-hoc distinct would rival the join itself.
  */
object RangeJoin {

  /** Overlap join of two interval tables: rows (l, r) with
    * `l.lo < r.hi && r.lo < l.hi` (half-open [lo, hi) overlap).
    * `bucketWidth` trades bucket fan-out (≈ interval_len/width per row)
    * against per-bucket pair density; set it near the typical interval
    * length. Output: left columns prefixed `l_`, right prefixed `r_`. */
  def overlapBucketed(
      left: DataFrame, right: DataFrame,
      leftLo: String, leftHi: String, rightLo: String, rightHi: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def withBuckets(df: DataFrame, lo: String, hi: String, prefix: String) = {
      val renamed = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, s"$prefix$c"))
      renamed.withColumn("__bk",
        explode(sequence(
          floor(col(s"$prefix$lo") / bucketWidth).cast("long"),
          floor(col(s"$prefix$hi") / bucketWidth).cast("long"))))
    }
    val l = withBuckets(left, leftLo, leftHi, "l_")
    val r = withBuckets(right, rightLo, rightHi, "r_")
    l.join(r,
        l("__bk") === r("__bk") &&
          col(s"l_$leftLo") < col(s"r_$rightHi") &&
          col(s"r_$rightLo") < col(s"l_$leftHi") &&
          // first-overlapping-bucket guard: emit each pair exactly once
          l("__bk") === floor(greatest(col(s"l_$leftLo"), col(s"r_$rightLo")) / bucketWidth).cast("long"))
      .drop("__bk")
  }
}
