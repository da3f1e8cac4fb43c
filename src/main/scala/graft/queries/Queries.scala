package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One verifiable operator: a Spark query + (when SQL-expressible) an
  * equivalent DuckDB oracle over the same parquet tables.
  *
  * Cross-engine exactness rules (the driver hash-compares values):
  *  - aggregate doubles through exact decimal sums, cast back to double
  *    (order-independent, so Spark's parallel partial aggs and DuckDB's
  *    serial scan agree bit-for-bit);
  *  - per-row arithmetic stays in pure IEEE +,-,*,/ with the same
  *    expression shape on both sides (bit-identical);
  *  - every result has a total ORDER BY;
  *  - integer/string outputs wherever transcendentals would be involved
  *    (exp/log differ by ulps across libm implementations).
  */
final case class Q(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries run in Bench at sf0.1 */
    bench: Boolean = false)

object Queries {
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark 4 only reads as raw longs (legacy nanosAsLong conf). Surface
    * `ts` as a microsecond TIMESTAMP (truncated ns→µs exactly like
    * DuckDB's reader does), so downstream ops see a normal column. */
  def eventsTbl(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    nsTsToMicros(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** The ns-long→µs-timestamp half of the events read recipe, shared
    * with the streaming twin ([[graft.streaming.EventStream
    * .streamingTumblingCounts]]) so the batch/oracle path and the
    * stream path cannot drift on the `ts` encoding. */
  def nsTsToMicros(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Exact decimal sum of a double column, surfaced as double. Scale is
    * chosen so the sum's UNSCALED value stays below 2^53: then both
    * engines' decimal→double conversions are the unique correctly-rounded
    * result (wider decimals convert with engine-dependent last-ulp
    * rounding — Java BigDecimal vs DuckDB int128/10^scale division). */
  def dsum(c: Column, precision: Int = 30, scale: Int = 4): Column =
    sum(c.cast(DecimalType(precision, scale))).cast("double")

  /** DuckDB side of [[dsum]]. */
  def dsumSql(expr: String, precision: Int = 30, scale: Int = 4): String =
    s"CAST(SUM(CAST($expr AS DECIMAL($precision,$scale))) AS DOUBLE)"

  val all: Seq[Q] =
    Relational.qs ++ GlmQueries.qs ++ TextQueries.qs ++ SimilarityQueries.qs ++
      PipelineQueries.qs

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
