package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the events schema
  * (event_id, ts, user_id, event_type, value).
  *
  * Each transform takes a DataFrame and works on BOTH streaming and
  * batch inputs — the Structured Streaming model — so EventsAnalytics'
  * batch queries and these incremental versions share semantics and
  * StreamingSpec can assert equivalence. At scale: state is partitioned
  * by the group key across executors, watermarks bound state size, and
  * late events beyond the watermark are dropped deterministically.
  */
object EventStreams {

  /** Tumbling-window counts with a watermark: the incremental version of
    * EventsAnalytics.e03HourlyAgg. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // DECIMAL accumulation like the batch twin's moneySum: the total
        // is partition/trigger-order independent, so stream == batch
        coalesce(sum(col("value").cast("decimal(18,2)")).cast("double"), lit(0.0))
          .as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sliding-window event rate per type (10-min slide over 1-hour window). */
  def slidingRate(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, total: Double)
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, duration_s: Long, total_value: Double)

  val GapSeconds: Long = 30 * 60L

  /** Floor a millisecond epoch to whole seconds — the batch twin compares
    * `ts.cast(long)` values (second precision), so the streaming gap rule
    * must truncate identically or sub-second data sessions diverge. */
  private def floorSec(ms: Long): Long = Math.floorDiv(ms, 1000L)

  /** Custom stateful sessionization via flatMapGroupsWithState: emits a
    * session when >30 min of inactivity passes (event-time timeout). The
    * streaming twin of EventsAnalytics.e01Sessionize — gap and duration
    * are computed on second-truncated timestamps exactly like the batch
    * `cast(ts as long)` arithmetic. State per user is O(1); the watermark
    * evicts idle users.
    */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          def emit(s: SessionState): Session =
            Session(user, new Timestamp(s.start), new Timestamp(s.last),
              s.n, floorSec(s.last) - floorSec(s.start), s.total)
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(emit(s))
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t >= s.start =>
                  if (floorSec(t) - floorSec(s.last) <= GapSeconds)
                    cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1,
                      total = s.total + e.value))
                  else {
                    closed += emit(s)
                    cur = Some(SessionState(t, t, 1L, e.value))
                  }
                case Some(s) =>
                  // cross-batch late event BEFORE the open session: merge
                  // (lowering the start) if it is within the gap, else it
                  // is its own already-closed session — it cannot join any
                  // future event, which all arrive at or after s.start
                  if (floorSec(s.start) - floorSec(t) <= GapSeconds)
                    cur = Some(s.copy(start = t, n = s.n + 1, total = s.total + e.value))
                  else
                    closed += Session(user, new Timestamp(t), new Timestamp(t), 1L, 0L, e.value)
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur match {
              case Some(s) =>
                state.update(s)
                // timeout fires once event time passes the last instant
                // that could still extend the session (whole-second rule)
                state.setTimeoutTimestamp((floorSec(s.last) + GapSeconds + 1) * 1000L)
              case None => ()
            }
            closed.result().iterator
          }
      }
  }

  /** Deduplicated stream: drop duplicate event_ids within the watermark —
    * the streaming form of exact dedup. dropDuplicatesWithinWatermark is
    * the state-bounded operator: entries are evicted once the watermark
    * passes them (plain dropDuplicates on a non-event-time key would keep
    * one state entry per id FOREVER and eventually exhaust the store). */
  def dedupStream(events: DataFrame): DataFrame = {
    val withWm = events.withWatermark("ts", "1 hour")
    if (events.isStreaming) withWm.dropDuplicatesWithinWatermark("event_id")
    else withWm.dropDuplicates("event_id") // batch twin: no state to bound
  }

  /** readStream → transform → writeStream, end to end: parquet file sink
    * with a checkpoint — Spark's exactly-once contract (offsets + sink
    * commit log in the checkpoint; restarted queries resume, never
    * duplicate a batch). Returns the started query; callers own stop().
    */
  def toParquetSink(transformed: DataFrame, outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    transformed.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
}
