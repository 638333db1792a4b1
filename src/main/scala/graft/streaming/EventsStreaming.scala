package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured-Streaming forms of the events analytics (q37/q38) — the
  * stream-native path a training-data pipeline runs against a live event
  * feed, with semantics PINNED to the batch queries: each operator is
  * specified as "drain the stream, get exactly the batch answer on the
  * same rows", and `EventsStreamingSpec` asserts that equivalence through
  * `MemoryStream`, including state carried across triggers.
  *
  * SURVEY §2.8 scopes the reference to batch-with-checkpoints (the
  * reference has no streams), so these are additive capability, not §2
  * coverage; they exist because the `events` table is the batch image of
  * an event STREAM and the engine should accept either shape.
  *
  * Scale shape: both operators are keyed-state streaming aggregations —
  * state is hash-partitioned by (window, event_type) / user_id exactly
  * like the batch shuffles, watermarks bound state size, and nothing here
  * holds per-partition state beyond Spark's state store.
  */
object EventsStreaming {

  /** Streaming q37: hourly tumbling buckets per event type. In production
    * run with `OutputMode.Append` — the watermark closes each hour bucket
    * `allowedLateness` after event time passes it and bounds state; the
    * test drains a finite stream in Complete mode to compare against the
    * batch answer. Bucket is BIGINT epoch seconds (engine-neutral, same
    * as q37). Input schema: (event_id, user_id, event_type, ts, value,
    * props) — the events table. */
  def hourlyBuckets(events: DataFrame, allowedLateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", allowedLateness)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 2))).as("sum_value"))
      .select(
        unix_timestamp(col("w.start")).cast("long").as("bucket"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Streaming exact dedup — the stream form of q21's content-hash dedup
    * and the first stage of any streaming training-data ingest: keep the
    * first arrival per key, drop re-deliveries (at-least-once sources
    * re-deliver). `dropDuplicates` keeps keyed state; the watermark lets
    * Spark expire state for keys older than `allowedLateness`, which is
    * what makes the operator runnable forever at ingest scale (without it
    * state grows unboundedly). `dropDuplicatesWithinWatermark` drops any
    * re-delivery whose first arrival was within the watermark delay, even
    * when the duplicate carries a slightly different event time (the
    * at-least-once-redelivery reality). Dedup state carries across
    * triggers — asserted in the spec. */
  def dedupByKey(
      events: DataFrame,
      keyCol: String,
      allowedLateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", allowedLateness)
      .dropDuplicatesWithinWatermark(keyCol)

  final case class SessionEvent(event_id: Long, user_id: Long, ts: java.sql.Timestamp)
  final case class SessionAssignment(event_id: Long, user_id: Long, session_idx: Long)
  final case class SessionState(lastTsMs: Long, sessionIdx: Long)

  val SessionGapMs: Long = 30 * 60 * 1000L

  /** Streaming q38: per-user 30-minute-gap sessionization via
    * `flatMapGroupsWithState` — keyed state (last event time + running
    * session index) survives across triggers, so a user whose events span
    * many micro-batches gets the same session indices the batch
    * lag+running-sum windows assign. Events are processed in (ts,
    * event_id) order within each trigger's group (Spark guarantees no
    * cross-trigger reordering per key only via state, which is exactly
    * what the state carries). */
  def sessionize(spark: SparkSession, events: Dataset[SessionEvent]): Dataset[SessionAssignment] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(assignSessions)
  }

  /** Pure state-transition function (unit-testable without a stream):
    * fold one trigger's events for one user over the carried state. */
  def assignSessions(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[SessionAssignment] = {
    val sorted = events.toArray.sortBy(e => (e.ts.getTime, e.event_id))
    var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L))
    val out = sorted.map { e =>
      val t = e.ts.getTime
      val idx =
        if (st.lastTsMs == Long.MinValue || t - st.lastTsMs > SessionGapMs)
          st.sessionIdx + 1
        else st.sessionIdx
      st = SessionState(t, idx)
      SessionAssignment(e.event_id, userId, idx)
    }
    state.update(st)
    out.iterator
  }
}
