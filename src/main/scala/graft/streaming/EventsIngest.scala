package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming ingest of the `events` table — the Spark-native
  * analogue of reader's CDC tailing loops (reference:
  * sources/mysql/streaming/iterator.go:265 binlog iterator,
  * sources/mongo/streaming.go:99 change streams,
  * sources/dynamodb/stream/shard.go shard workers).
  *
  * Reader hand-rolls per-source offset tracking (lib/storage/persistedmap,
  * sources/mysql/streaming/offset.go); Structured Streaming's checkpoint dir
  * IS that offset store — exactly-once file-source progress, crash-resumable
  * (WAL + offsets/ + commits/). `Trigger.AvailableNow` is the snapshot
  * backfill mode: drain everything currently in the source, then stop — the
  * same catch-up semantics as reader's snapshot-then-stream handoff.
  */
object EventsIngest {

  /** Stream the raw events file into a parquet landing zone with
    * checkpointed offsets, AvailableNow (runs to completion). Idempotent per
    * (landing, checkpoint) pair: a caller that wants a fresh run wipes both,
    * a caller that wants resume semantics keeps them.
    * Returns the landed row count.
    */
  def ingestAvailableNow(
      spark: SparkSession,
      eventsPath: String,
      landingDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 1): Long = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(eventsPath).schema

    // FileStreamSource wants a directory; point it at the parent with a
    // glob filter for the one table file.
    val dir = new java.io.File(eventsPath).getParent
    val fileName = new java.io.File(eventsPath).getName
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", fileName)
      .parquet(dir)
      // envelope the raw change rows exactly as the batch path does:
      // op 'r' + event-time millis (transformer.go:121)
      .withColumn("op", lit("r"))
      .withColumn("ts_ms", expr("ts div 1000000"))

    val q = stream.writeStream
      .format("parquet")
      .option("path", landingDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    spark.read.parquet(landingDir).count()
  }

  /** Fresh-run wrapper: wipe landing+checkpoint, ingest, return the landed
    * DataFrame. Used by the correctness battery so re-runs are idempotent. */
  def freshIngest(spark: SparkSession, eventsPath: String, workDir: String): DataFrame = {
    val landing = s"$workDir/landing"
    val ckpt = s"$workDir/ckpt"
    deleteRecursive(landing)
    deleteRecursive(ckpt)
    ingestAvailableNow(spark, eventsPath, landing, ckpt)
    spark.read.parquet(landing)
  }

  private def deleteRecursive(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.deleteIfExists(f))
    }
  }
}
