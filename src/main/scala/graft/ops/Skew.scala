package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path. AQE's skew-join
  * handling covers sort-merge joins automatically (enabled in Bench);
  * these cover the two cases AQE doesn't: hot-key aggregation and
  * broadcast-infeasible skewed joins.
  */
object Skew {

  /** Two-phase (salted) aggregation: count/sum per key when a handful of
    * keys dominate. Phase 1 aggregates (key, salt) partials across
    * `nSalts` buckets; phase 2 merges per key — the hot key's rows spread
    * over `nSalts` reducers instead of one. */
  def saltedAgg(
      df: DataFrame, key: Column, value: Column, nSalts: Int): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    df.select(key.as("__k"), value.as("__v"),
        (pmod(spark_partition_id() + monotonically_increasing_id(), lit(nSalts)))
          .as("__salt"))
      .groupBy(col("__k"), col("__salt"))
      .agg(count(lit(1)).as("__pn"), sum(col("__v")).as("__ps"))
      .groupBy(col("__k"))
      .agg(sum(col("__pn")).cast("long").as("n"), sum(col("__ps")).as("total"))
      .withColumnRenamed("__k", "key")
  }

  /** Salted join for a skewed left side against a small-ish right side
    * that is still too big to broadcast whole: replicate each right row
    * `nSalts` times, salt the left uniformly, join on (key, salt). */
  def saltedJoin(
      left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      nSalts: Int): DataFrame = {
    // nSalts = 0 silently returns ZERO rows (null pmod never equals any
    // exploded salt) instead of erroring — validate like every other op
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(nSalts)))
    val explodedRight = right
      .withColumn("__salt", explode(sequence(lit(0L), lit(nSalts - 1L))))
    saltedLeft.join(explodedRight,
      saltedLeft(leftKey) === explodedRight(rightKey)
        && saltedLeft("__salt") === explodedRight("__salt"))
      .drop("__salt")
  }
}
