package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** A raw event row as both batch and stream sides see it. */
case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
              event_type: String, value: Double)

/** Per-user running state emitted by `runningUserState` — the streaming
  * twin of queries.Events.evStateful. */
case class UserUpdate(event_id: Long, user_id: Long, n_purch: Long, cum_value: Double)

/** Structured Streaming twins of the batch event-time operators in
  * graft.queries.Events (SURVEY.md §2.9). Each takes any events
  * DataFrame — `readStream` (rate, kafka, files) or a MemoryStream in
  * tests — and applies the SAME window/gap specs as the batch queries, so
  * StreamingSpec can assert batch/stream parity on identical input.
  *
  * Watermarks bound state: at 100 TB/day the 10-minute watermark is what
  * lets the window and session state stores evict — every operator here
  * is incremental and partitioned by its group key, never global.
  */
object EventStreams {

  /** ev_tumbling twin: 1-hour tumbling counts with a 10-min watermark. */
  def tumblingCounts(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** ev_sliding twin: 1h window every 15m. */
  def slidingCounts(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("win_start"), col("n"), col("sum_value"))

  /** ev_session twin: 30-min-gap session windows per user. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("session_window.start").as("sess_start"), col("user_id"),
              col("n_events"), col("sum_value"))

  /** ev_dedup twin: exactly-once by event_id with watermark-bounded state
    * (dropDuplicatesWithinWatermark evicts ids older than the watermark —
    * the only dedup shape whose state doesn't grow forever). */
  def dedupByEventId(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Same running state on the Spark 4 `transformWithState` API — the
    * successor to mapGroupsWithState: explicit named state with TTL
    * support, timers, and state-store-backed ValueState. Preferred for
    * new 100 TB pipelines (state evolution + RocksDB-friendly). */
  class RunningUserStateProcessor extends StatefulProcessor[Long, Ev, UserUpdate] {
    @transient private var state: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double)](
        "userAgg", Encoders.product[(Long, Double)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[UserUpdate] = {
      var (nPurch, cum) = if (state.exists()) state.get() else (0L, 0.0)
      val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
        if (e.event_type == "purchase") nPurch += 1
        cum += e.value
        UserUpdate(e.event_id, key, nPurch, cum)
      }
      state.update((nPurch, cum))
      out.iterator
    }
  }

  /** ev_stateful twin on transformWithState (see processor above). */
  def runningUserStateTws(events: Dataset[Ev]): Dataset[UserUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningUserStateProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** ev_stateful twin: running per-user purchase count + cumulative value
    * via mapGroupsWithState. Events inside a microbatch are folded in
    * (ts, event_id) order so replays are deterministic. */
  def runningUserState(events: Dataset[Ev]): Dataset[UserUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double), UserUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Ev], state: GroupState[(Long, Double)]) =>
          var (nPurch, cum) = state.getOption.getOrElse((0L, 0.0))
          val out = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).map { e =>
            if (e.event_type == "purchase") nPurch += 1
            cum += e.value
            UserUpdate(e.event_id, userId, nPurch, cum)
          }
          state.update((nPurch, cum))
          out.iterator
      }
  }
}
