package graft.estimators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Metrics as single-pass aggregations (utils.py:172-181).
  *
  * NULL semantics match the reference's numpy arrays, not SQL: a NULL
  * label or prediction poisons the metric to NaN (SQL's avg/sum would
  * silently SKIP those rows and report a metric over a subset), and the
  * empty-input results are numpy's — mean of nothing is NaN, sum of
  * nothing is 0. The per-row `coalesce(expr, NaN)` turns row-level NULLs
  * into NaN, which then propagates through sum/avg the way nan does
  * through numpy reductions; a NULL *aggregate* can then only mean an
  * empty input. */
object Metrics {

  private def nanIfNull(e: Column): Column = coalesce(e, lit(Double.NaN))

  private def headOr(df: DataFrame, agg: Column, empty: Double): Double = {
    val row = df.select(agg).head()
    if (row.isNullAt(0)) empty else row.getDouble(0)
  }

  /** mean(y == ŷ) (utils.py:176-177). */
  def accuracyScore(df: DataFrame, label: Column, pred: Column): Double =
    headOr(df,
      avg(nanIfNull((label.cast("boolean") === pred.cast("boolean")).cast("double"))),
      Double.NaN)

  /** mean((y − ŷ)²) (utils.py:172-173). */
  def meanSquaredError(df: DataFrame, label: Column, pred: Column): Double =
    headOr(df, avg(nanIfNull(pow(label - pred, 2))), Double.NaN)

  /** 2·Σ(y·log1p(y/ŷ) − (y−ŷ)) — the reference's log1p form, NOT the
    * textbook log (utils.py:180-181). */
  def poissonDeviance(df: DataFrame, label: Column, pred: Column): Double =
    headOr(df,
      sum(nanIfNull((label * log1p(label / pred) - (label - pred)) * 2.0)),
      0.0)
}
