package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStreaming
import graft.streaming.EventsStreaming.{SessionAssignment, SessionEvent}

/** Structured-Streaming events analytics: each streaming operator drained
  * over the real sf0.001 events table must produce EXACTLY the batch
  * (q37/q38) answer on the same rows — including state carried across
  * multiple triggers (the data is split in half by time and fed in two
  * micro-batches). */
object EventsStreamingSpec {
  final case class EventRow(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
}

class EventsStreamingSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import EventsStreamingSpec.EventRow

  private val dir = "/root/testdata/sf0.001"

  private def eventRows: Array[EventRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/events.parquet").as[EventRow]
      .collect().sortBy(e => (e.ts.getTime, e.event_id))
  }

  test("streaming hourly buckets == batch q37 over the drained stream") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = eventRows
    val (first, second) = rows.splitAt(rows.length / 2)
    val stream = MemoryStream[EventRow]
    val query = EventsStreaming.hourlyBuckets(stream.toDF())
      .writeStream.format("memory").queryName("graft_hb_test")
      .outputMode("complete").start()
    try {
      stream.addData(first.toIndexedSeq)
      query.processAllAvailable()
      stream.addData(second.toIndexedSeq)
      query.processAllAvailable()
    } finally query.stop()
    // batch q37 emits sum_value as a canonical DECIMAL(18,2) string (r03
    // driver-hash fix); render the streamed decimal through the identical
    // cast chain before comparing
    val streamed = spark.table("graft_hb_test")
      .select(
        org.apache.spark.sql.functions.col("bucket"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.col("cnt"),
        org.apache.spark.sql.functions.col("sum_value")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)).cast("string")
          .as("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    val batch = Queries.all("q37_time_buckets")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming sessionization == batch q38, state across two triggers") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = eventRows.map(e => SessionEvent(e.event_id, e.user_id, e.ts))
    // split BY TIME so most users have events in both micro-batches — the
    // session index must continue from carried state, not restart at 1
    val (first, second) = rows.splitAt(rows.length / 2)
    val stream = MemoryStream[SessionEvent]
    val query = EventsStreaming.sessionize(spark, stream.toDS())
      .writeStream.format("memory").queryName("graft_sess_test")
      .outputMode("append").start()
    try {
      stream.addData(first.toIndexedSeq)
      query.processAllAvailable()
      stream.addData(second.toIndexedSeq)
      query.processAllAvailable()
    } finally query.stop()
    val streamed = spark.table("graft_sess_test")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._2, t._1))
    val batch = Queries.all("q38_sessionize")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._2, t._1))
    assert(streamed.nonEmpty)
    // a user split across triggers must NOT restart sessions
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming dedup drops re-deliveries across triggers") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = eventRows.take(200)
    val (first, second) = rows.splitAt(100)
    // second trigger re-delivers 50 of the first trigger's events (some
    // with a nudged timestamp — the at-least-once reality) plus new ones
    val redelivered = first.take(50).map(e =>
      e.copy(ts = new Timestamp(e.ts.getTime + 1000)))
    val stream = MemoryStream[EventRow]
    val query = EventsStreaming.dedupByKey(stream.toDF(), "event_id", "1 hour")
      .writeStream.format("memory").queryName("graft_dedup_test")
      .outputMode("append").start()
    try {
      stream.addData(first.toIndexedSeq)
      query.processAllAvailable()
      stream.addData((redelivered ++ second).toIndexedSeq)
      query.processAllAvailable()
    } finally query.stop()
    val out = spark.table("graft_dedup_test")
      .select("event_id").collect().map(_.getLong(0))
    assert(out.length == out.distinct.length, "duplicates survived")
    assert(out.toSet == rows.map(_.event_id).toSet,
      "dedup must keep exactly one arrival per event_id")
  }

  test("assignSessions state transition is pure and gap-exact") {
    val base = 1700000000000L
    def ev(id: Long, tMs: Long) = SessionEvent(id, 1L, new Timestamp(tMs))
    // no prior state: first event opens session 1; 30-min gap is INCLUSIVE
    // (gap must EXCEED 1800s to split, matching q38's `> 1800`)
    val st = new TestGroupState[EventsStreaming.SessionState]
    val out = EventsStreaming.assignSessions(1L,
      Iterator(
        ev(1, base), ev(2, base + EventsStreaming.SessionGapMs),
        ev(3, base + 2 * EventsStreaming.SessionGapMs + 1000)),
      st).toSeq
    assert(out == Seq(
      SessionAssignment(1, 1, 1), SessionAssignment(2, 1, 1),
      SessionAssignment(3, 1, 2)))
    // carried state continues the numbering in a later trigger
    val out2 = EventsStreaming.assignSessions(1L,
      Iterator(ev(4, base + 5 * EventsStreaming.SessionGapMs)), st).toSeq
    assert(out2 == Seq(SessionAssignment(4, 1, 3)))
  }

  /** Minimal in-memory GroupState for driving the pure transition fn. */
  private class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
    private var value: Option[S] = None
    override def exists: Boolean = value.isDefined
    override def get: S = value.get
    override def getOption: Option[S] = value
    override def update(newValue: S): Unit = value = Some(newValue)
    override def remove(): Unit = value = None
    override def setTimeoutDuration(durationMs: Long): Unit = ()
    override def setTimeoutDuration(duration: String): Unit = ()
    override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
    override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
    override def hasTimedOut: Boolean = false
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
