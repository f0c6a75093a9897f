package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.sources.Tables

/** Watermarked windowed aggregation running as a real stream — the
  * continuous counterpart of the stream_events batch-parity query. */
class StreamingAggSpec extends AnyFunSuite {
  import TestSpark._

  test("watermark + 1-day windowed agg over the event stream matches batch") {
    val batchEv = Tables.events(spark, Sf)
      .select(expr("timestamp_micros(ts_ns div 1000)").as("ts"),
        col("event_type"), col("value"))

    val batch = batchEv
      .groupBy(col("event_type"), window(col("ts"), "1 day").getField("start").as("w"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.get(1).toString, r.getLong(2))).toSet

    val work = java.nio.file.Files.createTempDirectory("wagg").toString
    batchEv.write.mode("overwrite").parquet(s"$work/in")
    val stream = spark.readStream.schema(batchEv.schema).parquet(s"$work/in")
      .withWatermark("ts", "1 hour")
      .groupBy(col("event_type"), window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("window.start").as("w"), col("n"))
    val q = stream.writeStream.format("memory").queryName("wagg")
      .outputMode(OutputMode.Append()).option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("wagg")
      .collect().map(r => (r.getString(0), r.get(1).toString, r.getLong(2))).toSet

    // append mode emits only watermark-closed windows; the final day stays
    // open, everything emitted must match batch exactly
    assert(streamed.subsetOf(batch))
    assert(streamed.size >= batch.size - 10) // at most the last open window per type
    assert(streamed.nonEmpty)
  }
}
