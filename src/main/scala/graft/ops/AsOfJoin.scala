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
    * `rightPayload` columns are carried; ties on (key, rightTime) must be
    * pre-deduplicated by the caller for deterministic output.
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val lSel: Seq[org.apache.spark.sql.Column] =
      Seq(col(leftKey).as("__k"), col(leftTime).as("__t"),
        lit(1).as("__isLeft"), lit(null).cast("int").as("__m")) ++
        lCols.map(c => col(c).as(s"l_$c")) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(s"r_$c"))
    val l = left.select(lSel: _*)
    val rSel: Seq[org.apache.spark.sql.Column] =
      Seq(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__isLeft"), lit(1).as("__m")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"l_$c")) ++
        rightPayload.map(c => col(c).as(s"r_$c"))
    val r = right.select(rSel: _*)
    // right rows sort BEFORE left rows at equal time (asof is inclusive)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__isLeft").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (rightPayload.map(c => s"r_$c") :+ "__m")
      .foldLeft(l.unionByName(r)) { (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
    carried
      .filter(col("__isLeft") === 1 && col("__m").isNotNull)
      .select(lCols.map(c => col(s"l_$c").as(c)) ++
        rightPayload.map(c => col(s"r_$c").as(c)): _*)
  }
}
