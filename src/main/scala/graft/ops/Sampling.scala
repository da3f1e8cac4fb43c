package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-balancing sampling operators. A training-data pipeline rarely
  * wants uniform random rows — it wants "at most k documents per source/
  * language/domain", deterministically, so reruns and backfills pick the
  * SAME rows.
  */
object Sampling {

  /** Keep at most `k` rows per key group, selected deterministically by
    * `orderBy` (ties broken by every following column). Content-hash
    * ordering (e.g. `md5(text)`) gives a stable pseudo-random pick that
    * is reproducible across runs, engines, and partitionings — unlike
    * `sample()`, whose selection depends on Spark's RNG and row order.
    *
    * 100 TB shape: one hash shuffle on the key columns; Spark's
    * WindowGroupLimit pushes the `rn <= k` bound into the sort on each
    * side of the exchange, so no group is fully sorted or materialized
    * beyond its top-k. */
  def stratifiedCap(df: DataFrame, keyCols: Seq[String], k: Int,
      orderBy: Seq[Column]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    require(orderBy.nonEmpty, "orderBy must be non-empty (determinism)")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderBy: _*)
    // collision-proof temp name: a caller's own "__rn" column must
    // survive untouched
    val rn = Iterator.from(0).map(i => s"__rn$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(rn)
  }
}
