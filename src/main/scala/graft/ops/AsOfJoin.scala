package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — an operator Spark lacks
  * natively. Composed from built-ins per the custom-operator preference
  * ladder (compose > custom Expression > custom plan): tag-and-union both
  * sides, sort within key by (time, tag), carry the latest right payload
  * forward with a last_value-ignore-nulls window, keep left rows.
  *
  * Cost shape: ONE shuffle of (key) over left+right — the distributed
  * as-of idiom; no range cross-products, no per-key collect. Skewed keys
  * inherit AQE handling of the single exchange.
  */
object AsOfJoin {

  /** For each left row, attach the right row with the greatest
    * `rightTime <= leftTime` for the same key (inner semantics: left rows
    * with no prior right row are dropped).
    *
    * `rightPayload` columns are carried as ONE struct with a single
    * last(ignoreNulls) — so every output field comes from the same matched
    * right row, and a genuinely-NULL payload field inside that row
    * survives (per-column carries would skip it and splice in an older
    * row's value, diverging from native ASOF semantics). Ties on
    * (key, rightTime) must be pre-deduplicated by the caller for
    * deterministic output.
    *
    * NULL times are excluded on both sides (native ASOF semantics:
    * a null never satisfies `rightTime <= leftTime`). Without the
    * filter, ascending-nulls-first ordering would treat a null-time
    * right row as "before everything" and carry its payload into left
    * rows that should have no match. NULL keys are excluded for the
    * same reason: the window's partitionBy groups all null keys into
    * ONE partition, so a null-key left row would receive a null-key
    * right row's payload — a fabricated match no equi-keyed ASOF join
    * (NULL never equals NULL) would produce.
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftNn = left.filter(col(leftTime).isNotNull && col(leftKey).isNotNull)
    val right0 = right.filter(col(rightTime).isNotNull && col(rightKey).isNotNull)
    val lCols = left.columns.toSeq
    val payloadType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c).copy(name = c)))
    val lSel: Seq[org.apache.spark.sql.Column] =
      Seq(col(leftKey).as("__k"), col(leftTime).as("__t"),
        lit(1).as("__isLeft"), lit(null).cast(payloadType).as("__rp")) ++
        lCols.map(c => col(c).as(s"l_$c"))
    val l = leftNn.select(lSel: _*)
    val rSel: Seq[org.apache.spark.sql.Column] =
      Seq(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__isLeft"),
        struct(rightPayload.map(c => col(c).as(c)): _*).cast(payloadType).as("__rp")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"l_$c"))
    val r = right0.select(rSel: _*)
    // right rows sort BEFORE left rows at equal time (asof is inclusive)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__isLeft").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__rp", last(col("__rp"), ignoreNulls = true).over(w))
    carried
      .filter(col("__isLeft") === 1 && col("__rp").isNotNull)
      .select(lCols.map(c => col(s"l_$c").as(c)) ++
        rightPayload.map(c => col("__rp").getField(c).as(c)): _*)
  }
}
