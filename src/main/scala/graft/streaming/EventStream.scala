package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table: watermarked
  * tumbling-window aggregation + stateful sessionization. The reference is
  * batch-only (SURVEY §2.7 declares streaming absent); this is the
  * engine's forward-looking ingestion path, designed so the same
  * aggregation logic runs identically in batch (`tumblingCounts`) and
  * streaming (`streamingTumblingCounts`) — the batch form is what the
  * DuckDB oracle checks.
  */
/** Typed event row for the stateful path (tsUs mirrors `ts` in µs so the
  * state logic is pure integer math). */
case class Event(event_id: Long, ts: java.sql.Timestamp, tsUs: Long,
    user_id: Long, event_type: String, value: Double)
case class SessionState(n: Long, startUs: Long, endUs: Long)
case class SessionOut(user_id: Long, n_events: Long, start_us: Long, end_us: Long)

object EventStream {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Exact decimal sum of `value`, surfaced as double — DELEGATES to the
    * shared dsum so this aggregation and the q60 DuckDB oracle
    * (dsumSql) can never drift apart on precision/scale. */
  private def valueTotal =
    graft.queries.Queries.dsum(col("value")).as("total")

  /** Batch tumbling window: 5-minute buckets keyed by event_type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(
        window(col("ts"), "5 minutes").getField("start").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), valueTotal)

  /** Raw read schema of an events fixture file/directory: [[eventSchema]]
    * with `ts` swapped to whatever the parquet actually stores — a raw
    * nanosecond long for legacy TIMESTAMP(NANOS) fixtures, TIMESTAMP_NTZ
    * for µs ones (see `Queries.normalizeEventsTs` for the two
    * encodings). A file-stream source must declare its schema upfront,
    * and declaring the wrong `ts` type fails the read against the very
    * table the batch twin consumes — so probe the footer with a cheap
    * driver-side batch read first. */
  def rawEventsSchema(spark: SparkSession, path: String): StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType = spark.read.parquet(path).schema("ts").dataType
    StructType(eventSchema.map {
      case f if f.name == "ts" => f.copy(dataType = tsType)
      case f => f
    })
  }

  /** Streaming twin of [[tumblingCounts]] with a 10-minute watermark,
    * reading the project's events fixture layout directly: the stream
    * declares the probed raw schema ([[rawEventsSchema]]) and normalizes
    * `ts` with the SAME recipe as the batch/oracle path
    * (`Queries.normalizeEventsTs`), so the two cannot drift. */
  def streamingTumblingCounts(spark: SparkSession, path: String): DataFrame =
    tumblingCountsStreaming(
      graft.queries.Queries.normalizeEventsTs(
        spark.readStream.schema(rawEventsSchema(spark, path)).parquet(path)))

  def tumblingCountsStreaming(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), valueTotal)
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total"))

  /** Batch sliding window: `sizeMinutes` windows every `slideMinutes`
    * (each event lands in size/slide windows), keyed by event_type. */
  def slidingCounts(events: DataFrame, sizeMinutes: Int = 10,
      slideMinutes: Int = 5): DataFrame =
    events
      .groupBy(
        window(col("ts"), s"$sizeMinutes minutes", s"$slideMinutes minutes")
          .getField("start").as("win_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), valueTotal)

  /** Streaming twin of [[slidingCounts]] (watermarked). */
  def slidingCountsStreaming(events: DataFrame, sizeMinutes: Int = 10,
      slideMinutes: Int = 5): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(
        window(col("ts"), s"$sizeMinutes minutes", s"$slideMinutes minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), valueTotal)
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total"))

  /** Batch twin of the stream-stream interval join: each left event
    * matched to same-user right events with `r.ts <= l.ts < r.ts +
    * window` (e.g. click→view attribution). The batch form is the
    * DuckDB-oracle-checkable shape (q81). */
  def intervalJoinBatch(left: DataFrame, right: DataFrame,
      windowMinutes: Int): DataFrame =
    left.as("l").join(right.as("r"),
        col("l.user_id") === col("r.user_id") &&
          col("r.ts") <= col("l.ts") &&
          col("l.ts") < col("r.ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("l.event_id").as("l_id"), col("l.user_id").as("user_id"),
        col("l.ts").as("l_ts"), col("r.event_id").as("r_id"),
        col("r.ts").as("r_ts"))

  /** Stream-stream interval join with watermarks on BOTH sides: the
    * time-range predicate bounds each side's join state to the watermark
    * horizon (without it Spark must buffer both streams forever — the
    * planner rejects the query in append mode). Same output schema and
    * match semantics as [[intervalJoinBatch]]. */
  def intervalJoinStreaming(left: DataFrame, right: DataFrame,
      windowMinutes: Int, watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermark).as("l")
    val r = right.withWatermark("ts", watermark).as("r")
    l.join(r,
        col("l.user_id") === col("r.user_id") &&
          col("r.ts") <= col("l.ts") &&
          col("l.ts") < col("r.ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("l.event_id").as("l_id"), col("l.user_id").as("user_id"),
        col("l.ts").as("l_ts"), col("r.event_id").as("r_id"),
        col("r.ts").as("r_ts"))
  }

  /** Streaming exact dedup, the streaming twin of `Dedup.exact`:
    * `dropDuplicatesWithinWatermark` keeps each key's state only until
    * the watermark passes it — bounded state at unbounded input, the
    * only viable exact-dedup shape on an infinite stream (a plain
    * `dropDuplicates` would grow state forever). Duplicates arriving
    * within `watermark` of the first occurrence are suppressed. */
  def streamingDedup(
      events: DataFrame, idCols: Seq[String],
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Streaming stateful sessionization via flatMapGroupsWithState: one
    * state object per user (open-session bounds + count); a session is
    * emitted when the gap to the next event exceeds `gapMinutes` or the
    * state times out past the watermark. */
  def sessionizeStreaming(
      events: org.apache.spark.sql.Dataset[Event],
      gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def fn(userId: Long, it: Iterator[Event], state: GroupState[SessionState])
        : Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator.single(SessionOut(userId, s.n, s.startUs, s.endUs))
      }
      // ONE ascending gap-merge (island) pass over the batch's events
      // PLUS the stored open-session interval — exactly the batch twin's
      // gap-and-island on what this executor can see. This subsumes the
      // former per-event cases: a late (within-watermark) event inside or
      // gap-adjacent to the stored span merges (min/max — the span never
      // shrinks backward); late events older than gap-before-start merge
      // WITH EACH OTHER into their own earlier sessions (the old code
      // emitted each as a singleton, splitting a session the batch twin
      // would keep whole); and an event > gap past the open session
      // closes it. Islands before the last are final — any later event
      // in THIS batch is > gap away; a later micro-batch could still
      // bridge one in principle, which is the same inherent stream-vs-
      // batch approximation the singleton emit had. The LAST island
      // stays open as state.
      val items =
        (it.map(e => (1L, e.tsUs, e.tsUs)) ++
          state.getOption.map(s => (s.n, s.startUs, s.endUs)))
          .toArray.sortBy(x => (x._2, x._3))
      if (items.isEmpty) return Iterator.empty
      var islands = List.empty[(Long, Long, Long)] // newest first
      items.foreach { case (n, s0, e0) =>
        islands match {
          case (pn, ps, pe) :: rest if s0 - pe <= gapUs =>
            islands = (pn + n, ps, math.max(pe, e0)) :: rest
          case _ => islands = (n, s0, e0) :: islands
        }
      }
      val open = islands.head
      state.update(SessionState(open._1, open._2, open._3))
      state.setTimeoutTimestamp(open._3 / 1000L, s"$gapMinutes minutes")
      islands.tail.reverseIterator
        .map { case (n, s0, e0) => SessionOut(userId, n, s0, e0) }
    }

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
      .toDF()
  }

  /** Stateful sessionization: events within `gapMinutes` of each other on
    * the same user belong to one session (flatMapGroupsWithState in the
    * streaming path; the batch twin uses a windowed gap-and-island, which
    * is the oracle-checkable form). */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val gapUs = gapMinutes * 60L * 1000000L
    events
      // NULL keys/times drop (the intervalJoinBatch equi-join and asOf
      // convention): a NULL user_id window partition would gap-merge
      // DISTINCT unknown users into fabricated shared sessions, and a
      // NULL ts sorts first, emitting degenerate NULL-bound sessions
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        (col("prev_us").isNull ||
          (unix_micros(col("ts")) - col("prev_us")) > gapUs).cast("long"))
      .withColumn("session_seq",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
  }
}
