package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful stream processing: per-user session windows over the
  * events stream via `flatMapGroupsWithState` — the Spark-native shape of
  * reader's per-shard/per-key streaming loops that carry hand-rolled state
  * (reference: sources/dynamodb/stream/shard.go worker state,
  * sources/mysql/streaming/iterator.go:265 batch accumulation).
  *
  * State is bounded by an inactivity gap (event-time timeout): when a user
  * is silent for `gapMinutes`, their session closes and one summary row is
  * emitted. This is the canonical KeyValueGroupedDataset pattern — state
  * lives in the state store (checkpointed, crash-resumable), never on the
  * driver.
  */
object SessionWindows {

  /** `ts` doubles as the event-time/watermark column (must stay a real
    * timestamp field so `withWatermark("ts", ...)` survives the `as[Event]`
    * conversion). */
  case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, sum_value: Double)

  def sessionize(
      events: Dataset[Event],
      gapMs: Long): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, s.start, s.end, s.n, s.sum))
          } else {
            val sorted = rows.map(e => e.copy()).toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, s.start, s.end, s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Batch-mode sessionization with identical semantics (gap-split sessions
    * per user), for oracle checks and backfills: the lag/cumsum window
    * trick — one shuffle on user_id, no state store needed. */
  def sessionizeBatch(events: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts_ms")
    events
      .withColumn("prev_ts", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull || col("ts_ms") - col("prev_ts") > gapMs, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_id")
      .agg(
        min(col("ts_ms")).as("session_start"),
        max(col("ts_ms")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .drop("sess_id")
  }
}
