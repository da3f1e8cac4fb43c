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

  /** Read the events table and surface `ts` as a microsecond TIMESTAMP
    * regardless of which encoding the fixture generation used (see
    * [[normalizeEventsTs]]). The legacy nanosAsLong conf is set
    * unconditionally: it only affects TIMESTAMP(NANOS) files and is a
    * no-op for the µs encoding. */
  def eventsTbl(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Normalize the `ts` column of an events frame to a microsecond
    * TIMESTAMP. Two fixture encodings exist across testdata generations:
    *  - TIMESTAMP(NANOS) parquet, which Spark 4 reads only as a raw
    *    nanosecond long (legacy nanosAsLong conf) → truncate ns→µs
    *    exactly like DuckDB's reader does;
    *  - TIMESTAMP(MICROS) without the UTC-adjusted flag, which Spark
    *    reads as TIMESTAMP_NTZ → re-tag as TIMESTAMP. The session time
    *    zone is pinned to UTC project-wide, so the cast preserves the
    *    stored micros bit-exactly and agrees with DuckDB's naive
    *    TIMESTAMP read of the same file.
    * Shared with the streaming twin ([[graft.streaming.EventStream
    * .streamingTumblingCounts]]) so the batch/oracle path and the
    * stream path cannot drift on the `ts` encoding. Any other `ts`
    * type fails loudly rather than windowing garbage. */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType => df
      case other => throw new IllegalArgumentException(
        s"events.ts must be a nanosecond long or a timestamp, got $other")
    }

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

  /** Decade-sweep input sampling pin (VERDICT r13 #1): the handful of
    * rows whose verification cost IS the corpus — q20/q26 materialize
    * one output row per lineitem row, q140 one per token, q05 one per
    * order, q107 eight per vector with a 64-term SIN recompute each,
    * q87 replays the full near-dup graph, and q104's
    * oracle-frozen k=4 config is exact all-pairs O(n²/4) BY DESIGN —
    * restrict their input on BOTH engines to a deterministic uniform
    * key sample: keep keys with key·2654435761 ≡ 0 (mod
    * SPARK_GRAFT_SWEEP_SAMPLE_MOD). Knuth's multiplicative hash, the
    * same constant as q144's completeness probe, expressible
    * identically in Spark and DuckDB BIGINT arithmetic — evaluated in
    * the reduce-before-multiply form (see [[sweepSampledWith]]) so the
    * predicate stays overflow-free for any 64-bit key (sf1000's ~6e9
    * orderkeys included).
    *
    * Default 1 = OFF: the sf0.01 CORRECTNESS gate, the sf1/sf10 sweeps,
    * and every recorded artifact are byte-identical with the knob
    * unset. A decade sweep sets e.g. 50 and BOTH engines see the same
    * sub-corpus, so the verified computation stays end-to-end exact —
    * cell assignment, pair formation, component closure, window frames
    * (the sampled key is always the partition/grouping key, so no kept
    * group is truncated) — on a subset whose size the sweep chooses.
    * Read ONCE at object init and interpolated into the oracle SQL from
    * the same JVM (the SemDedupTau contract), so oracle_sql.json and
    * the engine dump can never disagree about the sample. */
  val SweepSampleMod: Long = {
    val v = sys.env.getOrElse("SPARK_GRAFT_SWEEP_SAMPLE_MOD", "1").toLong
    require(v >= 1, s"SPARK_GRAFT_SWEEP_SAMPLE_MOD must be >= 1, got $v")
    // The reduce-before-multiply predicate is overflow-free only while
    // mod < 2⁶³/2654435761 ≈ 3.47e9 ([[sweepSampledWith]]); past it the
    // (key%m)·(c%m) product wraps in Spark where DuckDB raises, which is
    // the exact engine divergence the reduced form eliminates. Enforce
    // the documented bound at the knob so an out-of-range modulus fails
    // loudly instead of diverging (ADVICE r14).
    require(v < Long.MaxValue / 2654435761L,
      s"SPARK_GRAFT_SWEEP_SAMPLE_MOD=$v exceeds the overflow-free bound " +
        s"2^63/2654435761 (~3.47e9) of the cross-engine sample predicate")
    v
  }

  /** Engine side of the sweep-sample pin: identity when the knob is
    * unset (no extra Filter node in the gate plans). */
  def sweepSampled(df: DataFrame, key: String): DataFrame =
    sweepSampledWith(df, key, SweepSampleMod)

  /** DuckDB side of [[sweepSampled]] — a WHERE-clause fragment. */
  def sweepSampleSql(key: String): String =
    sweepSampleSqlWith(key, SweepSampleMod)

  /** [[sweepSampled]] at an explicit modulus (SweepSampleSpec exercises
    * mod > 1 in-JVM — the env-bound knob is fixed at object init).
    *
    * Reduce-before-multiply: ((key % m)·(c % m)) % m ≡ (key·c) % m for
    * every nonnegative key, but the left form never leaves
    * [0, m²) — the raw product overflows signed 64-bit at key ≥
    * 2⁶³/2654435761 ≈ 3.5e9, i.e. one decade up (sf1000's ~6e9
    * orderkeys), where Java wraps silently while DuckDB raises an
    * overflow error: the two engines would DISAGREE about the sample
    * exactly when the sweep matters most. Safe while mod < 2⁶³/c —
    * every plausible sweep modulus. Kept-key sets are bit-identical
    * to the historical raw form at every current fixture scale. */
  def sweepSampledWith(df: DataFrame, key: String, mod: Long): DataFrame =
    if (mod <= 1L) df
    else df.filter(
      ((col(key).cast("long") % lit(mod)) * lit(2654435761L % mod))
        % lit(mod) === 0L)

  /** [[sweepSampleSql]] at an explicit modulus. */
  def sweepSampleSqlWith(key: String, mod: Long): String =
    if (mod <= 1L) "TRUE"
    else s"((($key % $mod) * ${2654435761L % mod}) % $mod = 0)"

  // LAZY is load-bearing: the per-domain objects call Queries helpers
  // (dsumSql, sweepSampleSql) while BUILDING their qs vals, so a plain
  // `all` would re-enter whichever domain object started the init chain
  // and read its still-null qs field (scalac's uninitialized-reference
  // warning class; surfaced as an NPE abort when a spec touched
  // SimilarityQueries before SparkEntry). Deferring the aggregation
  // breaks the cycle for every entry order.
  lazy val all: Seq[Q] =
    Relational.qs ++ GlmQueries.qs ++ TextQueries.qs ++ SimilarityQueries.qs ++
      PipelineQueries.qs

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
