package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.sources.Tables
import graft.streaming.SessionWindows
import graft.streaming.SessionWindows.Event

class SessionWindowsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val GapMs = 7200000L // 2h

  private def eventsDf = Tables.events(spark, Sf)
    .select(col("user_id"),
      expr("timestamp_micros(ts_ns div 1000)").as("ts"),
      col("event_type"), col("value"))

  test("batch sessionization: gap-split invariants hold") {
    val sess = SessionWindows.sessionizeBatch(
      eventsDf.withColumn("ts_ms", expr("unix_millis(ts)")), GapMs)
    val n = Tables.events(spark, Sf).count()
    assert(sess.agg(sum("n_events")).head().getLong(0) === n)
    // session bounds ordered, and no session spans a gap
    assert(sess.where(col("session_end") < col("session_start")).count() === 0)
  }

  test("stateful streaming sessionization agrees with the batch oracle") {
    val batch = SessionWindows.sessionizeBatch(
      eventsDf.withColumn("ts_ms", expr("unix_millis(ts)")), GapMs)
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet

    // drive the same rows through the streaming state machine
    val work = java.nio.file.Files.createTempDirectory("sess").toString
    eventsDf.write.mode("overwrite").parquet(s"$work/in")
    val stream = spark.readStream.schema(eventsDf.schema).parquet(s"$work/in")
      .withWatermark("ts", "1 minute")
      .as[Event]
    val out = SessionWindows.sessionize(stream, GapMs)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("sessions")
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet

    // every closed streaming session is a batch session; only the final
    // (still-open) session per user may be missing
    assert(streamed.subsetOf(batch), s"streaming emitted a non-batch session")
    val users = streamed.map(_._1) ++ batch.map(_._1)
    assert(streamed.size >= batch.size - users.size)
    assert(streamed.nonEmpty)
  }
}
