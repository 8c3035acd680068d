package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference engine has no streaming surface (SURVEY §2.F) — this is
  * part of the beyond-reference pipeline layer: the same windowed
  * aggregations and sessionization the batch queries provide, expressed as
  * incremental plans with watermark-bounded state, so the operators run
  * unchanged over a Kafka/file stream at production scale.
  */
object EventStreams {

  /** Canonical events shape AFTER loading: `ts` is raw nanosecond longs
    * whatever the parquet encoding (see [[graft.TradeGraph.normalizeTs]]). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** [[eventsSchema]] with `ts` swapped for the type the files at `path`
    * actually carry — a streaming source needs the schema up front, and
    * the driver's events parquet has shipped both as TIMESTAMP(NANOS)
    * (readable only as longs) and TIMESTAMP(MICROS) (TIMESTAMP_NTZ). One
    * footer read (no data scan) settles it. On an empty drop directory the
    * probe can't infer anything — fall back to [[eventsSchema]] (ns-long
    * `ts`) so a dedicated empty dir can still start the stream. */
  private def fileSchema(spark: SparkSession, path: String): StructType = {
    val onDisk =
      try spark.read.parquet(path).schema("ts").dataType
      catch { case _: org.apache.spark.sql.AnalysisException => LongType }
    StructType(eventsSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = onDisk) else f))
  }

  /** File-based event stream from a directory (or glob) of parquet drops,
    * normalized to [[eventsSchema]] + an `event_time` TIMESTAMP column for
    * watermarks.
    *
    * `path` must select event files ONLY (e.g. `dir/events.parquet` or a
    * drop directory dedicated to the stream): Spark's file source applies
    * the fixed schema to every matched file, so foreign parquet in the same
    * glob would surface as all-null rows. */
  def readEventStream(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.TradeGraph.normalizeTs(
        spark.readStream.schema(fileSchema(spark, path)).parquet(path))
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Batch twin of [[readEventStream]]: the same normalized shape
    * (ns-long `ts` + `event_time`) over a static read, so any streaming
    * operator here can be parity-checked against itself in batch mode. */
  def readEventsBatch(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.TradeGraph.normalizeTs(spark.read.parquet(path))
      .withColumn("event_time", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Parse a watermark duration string ("2 hours", "30 minutes",
    * "1 day 12 hours") to milliseconds, for sizing keyed-state expiry to
    * the lateness horizon. Self-contained (no Spark-internal interval
    * APIs, which carry no compatibility guarantee across upgrades) and
    * covers the calendar-free subset Spark accepts for `withWatermark`;
    * month/year units are rejected — they have no fixed ms length. */
  private[streaming] def delayMs(watermark: String): Long = {
    val unit = Map(
      "week" -> 604800000L, "day" -> 86400000L, "hour" -> 3600000L,
      "minute" -> 60000L, "second" -> 1000L, "millisecond" -> 1L)
    val token = "(\\d+)\\s*(week|day|hour|minute|second|millisecond)s?"
    val all = s"(?i)\\s*(?:interval\\s+)?(?:$token\\s*)+"
    require(watermark.matches(all),
      s"unsupported watermark duration '$watermark' — use N " +
        "weeks/days/hours/minutes/seconds/milliseconds (months/years have " +
        "no fixed millisecond length)")
    s"(?i)$token".r.findAllMatchIn(watermark)
      .map(m => m.group(1).toLong * unit(m.group(2).toLowerCase))
      .sum
  }

  /** Tumbling-window counts/sums per event type with a bounded-state
    * watermark. Append-mode-compatible (emits finalized windows only). */
  def hourlyAggregates(events: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum("value"), 2).as("sum_value"))
      .select(unix_millis(col("window.start")).as("hour_ms"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window per-user activity (5 min windows every minute). */
  def slidingUserActivity(events: DataFrame,
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), "5 minutes", "1 minute"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("window.start")).as("win_ms"),
        col("user_id"), col("n"))

  /** Streaming exact deduplication: drops repeated event ids within the
    * watermark horizon — bounded state, the streaming face of
    * [[graft.ops.Dedup.exactGroups]]. */
  def dedupEvents(events: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .dropDuplicates("event_id")

  /** Per-user event-count milestones via `flatMapGroupsWithState` —
    * custom keyed state the built-in windowed aggregates can't express
    * (emit-on-crossing rather than emit-per-window). State is one counter
    * per user, expired by an event-time timeout one watermark horizon
    * after the user's last activity, so state stays bounded. Emission is
    * order-independent (pure count crossings), keeping the operator
    * deterministic under micro-batch re-ordering.
    *
    * @return stream of (user_id, n_events) rows, one per crossed multiple
    *         of `every`
    */
  def userMilestones(events: DataFrame, every: Int = 100,
      watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    // State expires one lateness horizon after the user's last activity —
    // tied to the caller's watermark so a longer lateness bound never
    // expires state that admissible late events could still touch.
    val horizonMs = math.max(delayMs(watermark), 1L)
    events
      .withWatermark("event_time", watermark)
      // keyed state needs a non-null key and a usable event time; null-user
      // events can't cross a per-user milestone by definition
      .where(col("user_id").isNotNull && col("event_time").isNotNull)
      .select(col("user_id").as[Long], col("event_time"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      // state = (event count, max event-time ms seen for this user)
      .flatMapGroupsWithState[(Long, Long), (Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp)],
            state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val (prev, prevMax) = state.getOption.getOrElse((0L, Long.MinValue))
            var next = prev
            var maxTs = prevMax
            rows.foreach { r =>
              next += 1
              maxTs = math.max(maxTs, r._2.getTime)
            }
            state.update((next, maxTs))
            // expire one lateness horizon after the user's LAST EVENT TIME
            // (not the batch watermark, which can lag the event by up to
            // the full delay — anchoring there could drop state while
            // admissible late events are still due, restarting the counter
            // and re-emitting crossed milestones). Timeouts must still sit
            // strictly above the current watermark.
            state.setTimeoutTimestamp(
              math.max(maxTs + horizonMs, state.getCurrentWatermarkMs() + 1L))
            // every multiple of `every` crossed inside this batch
            ((prev / every + 1) to (next / every))
              .map(k => (uid, k * every.toLong)).iterator
          }
      }
      .toDF("user_id", "n_events")
  }

  /** Stream-stream interval join: each `firstType` event pairs with the
    * same user's `thenType` events that follow within `horizon` —
    * funnel/attribution over two live streams (view→click, signup→purchase).
    *
    * Both sides carry a watermark and the join condition is an event-time
    * range, so Spark evicts join state once the watermark passes
    * `a_time + horizon` — state stays bounded by (rate × horizon) per side
    * regardless of total stream length, the property that lets this run
    * unchanged against a year-long Kafka topic. The equi-key (`user_id`)
    * keeps the physical join a hash/sort-merge on the key with the time
    * range as a residual filter — no cross product.
    *
    * Also callable on a BATCH DataFrame (watermarks become no-ops) — the
    * parity spec runs the same plan both ways.
    *
    * @return (user_id, first_event, then_event, gap_ms)
    */
  def eventFollowJoin(events: DataFrame, firstType: String = "view",
      thenType: String = "click", horizon: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame = {
    // state eviction for a stream-stream INNER join needs watermarks on
    // BOTH inputs plus the two-sided time bound below
    val a = events.filter(col("event_type") === firstType)
      .withWatermark("event_time", watermark)
      .select(col("user_id").as("a_user"), col("event_id").as("a_event"),
        col("event_time").as("a_time"))
    val b = events.filter(col("event_type") === thenType)
      .withWatermark("event_time", watermark)
      .select(col("user_id").as("b_user"), col("event_id").as("b_event"),
        col("event_time").as("b_time"))
    // Same-type funnels (click→click) need an order on equal-time pairs:
    // plain b_time >= a_time would emit BOTH (101,102) and (102,101) for
    // two simultaneous events (and every event paired with itself) —
    // follow pairs must be antisymmetric. Disjoint types keep the
    // inclusive bound: a simultaneous view+click is one valid follow pair
    // whichever event id is larger.
    // The time RANGE must stay a plain AND-conjunct pair — Spark's
    // stream-stream state eviction extracts the bounds from top-level
    // conjuncts only; the tie-break rides along as a residual predicate.
    val tieBreak =
      if (firstType == thenType)
        !(col("b_time") === col("a_time") &&
          col("b_event") <= col("a_event"))
      else lit(true)
    // a_event =!= b_event also guards duplicate DELIVERIES of one event
    // id at different timestamps (an at-least-once stream not routed
    // through dedupEvents first) — an event must never "follow itself"
    a.join(b, col("a_user") === col("b_user") &&
        col("a_event") =!= col("b_event") &&
        col("b_time") >= col("a_time") &&
        col("b_time") <= col("a_time") + expr(s"INTERVAL $horizon") &&
        tieBreak)
      .select(col("a_user").as("user_id"),
        col("a_event").as("first_event"),
        col("b_event").as("then_event"),
        (unix_millis(col("b_time")) - unix_millis(col("a_time")))
          .as("gap_ms"))
  }

  /** Streaming AS-OF enrichment — the incremental twin of
    * [[graft.ops.OrderedJoins.asofJoinBackward]] over one tagged stream:
    * rows carry (key, ts, isRight, payload); right rows update per-key
    * state (the latest payload by ts — a max merge, so right REDELIVERY
    * and in-batch disorder are absorbed), left rows emit (key, ts,
    * matched payload or null).
    *
    * Within a micro-batch, rows process in (ts, rights-first) order, so
    * a right row arriving in the same batch as a later left row IS
    * visible to it, and equal timestamps match (the backward-asof
    * inclusive rule). Across batches the state is whatever has ARRIVED,
    * and it keeps only the single LATEST right pair per key — so the
    * result equals the batch as-of join exactly when delivery is
    * cross-batch time-ordered for ALL rows (every row lands in an
    * earlier-or-same batch than every later-ts row; equal-ts rights no
    * later than their lefts). A right that arrives ahead of an
    * earlier-ts left overwrites the state that left needed — the
    * standard low-latency enrichment trade; buffering lefts behind a
    * watermark would trade latency for out-of-order tolerance. State
    * per key is ONE (ts, payload) pair; left duplicates re-emit
    * (at-least-once output). Rows with a null key, ts or side tag are
    * dropped; a null right payload loses max-merge ties to any
    * non-null one (the batch max-struct rule), and a left matching it
    * emits null — indistinguishable from no-match, as in the batch
    * operator's output.
    *
    * @param rows (key: long, ts: long, isRight: boolean, payload:
    *             string) — pre-unioned tagged stream
    */
  def asofEnrich(rows: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = rows.sparkSession
    import spark.implicits._
    rows.selectExpr("CAST(key AS LONG) AS key", "CAST(ts AS LONG) AS ts",
        "CAST(isRight AS BOOLEAN) AS isRight",
        "CAST(payload AS STRING) AS payload")
      .where(col("key").isNotNull && col("ts").isNotNull &&
        col("isRight").isNotNull)
      .as[(Long, Long, Boolean, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, String), (Long, Long, Option[String])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[(Long, Long, Boolean, String)],
            state: GroupState[(Long, String)]) =>
          // rights sort before lefts at equal ts → inclusive matching
          val batch = it.toArray.sortBy(r => (r._2, !r._3))
          var latest = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[
            (Long, Long, Option[String])]()
          // null payload loses ties to any non-null (the batch
          // max-struct rule, null-safe — String '>' would NPE).
          // Compare in UTF8String (UTF-8 byte / code-point) order, not
          // Java String UTF-16 code-unit order: for payloads mixing
          // supplementary-plane chars with U+E000..U+FFFF the two orders
          // disagree, and the batch asofJoinBackward's max(struct) uses
          // Spark's UTF8String ordering — the tie-break must be
          // bit-identical to it.
          def gtNullSafe(a: String, b: String): Boolean =
            if (a == null) false
            else b == null ||
              org.apache.spark.unsafe.types.UTF8String.fromString(a)
                .compareTo(
                  org.apache.spark.unsafe.types.UTF8String.fromString(b)) > 0
          batch.foreach { case (_, ts, isRight, payload) =>
            if (isRight) {
              // max-by-(ts, payload) merge: idempotent, order-independent
              if (latest.forall(l =>
                  ts > l._1 || (ts == l._1 && gtNullSafe(payload, l._2))))
                latest = Some((ts, payload))
            } else {
              // flatMap, not map: a matched-but-null payload emits None
              // (never Some(null)) — same observable output either way
              out += ((key, ts,
                latest.filter(_._1 <= ts).flatMap(l => Option(l._2))))
            }
          }
          latest.foreach(state.update)
          out.iterator
      }
      .toDF("key", "ts", "matched")
  }

  /** Session windows (native session_window, 30-minute gap): the streaming
    * analogue of SparkEntry.q30_sessionize. */
  def sessionWindows(events: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), "30 minutes"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        col("n_events"), col("sum_value"))
}
