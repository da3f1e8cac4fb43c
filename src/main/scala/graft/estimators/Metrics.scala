package graft.estimators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Metrics as single-pass aggregations (utils.py:172-181). */
object Metrics {

  /** mean(y == ŷ) (utils.py:176-177). */
  def accuracyScore(df: DataFrame, label: Column, pred: Column): Double =
    df.select(avg((label.cast("boolean") === pred.cast("boolean")).cast("double")))
      .head().getDouble(0)

  /** mean((y − ŷ)²) (utils.py:172-173). */
  def meanSquaredError(df: DataFrame, label: Column, pred: Column): Double =
    df.select(avg(pow(label - pred, 2))).head().getDouble(0)

  /** 2·Σ(y·log1p(y/ŷ) − (y−ŷ)) — the reference's log1p form, NOT the
    * textbook log (utils.py:180-181). */
  def poissonDeviance(df: DataFrame, label: Column, pred: Column): Double =
    df.select(sum((label * log1p(label / pred) - (label - pred)) * 2.0))
      .head().getDouble(0)
}
