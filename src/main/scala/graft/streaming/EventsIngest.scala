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
      checkpointDir: String): Long = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(eventsPath).schema
    val stream = fileStream(spark, eventsPath, schema)
      // normalize whatever physical ts type this testdata generation
      // carries to the canonical epoch-nanos long, so the landed schema
      // (and everything downstream of it) is generation-agnostic
      .withColumn("ts", graft.sources.Tables.tsNanos(schema("ts").dataType))
      // envelope the raw change rows exactly as the batch path does:
      // op 'r' + event-time millis (transformer.go:121)
      .withColumn("op", lit("r"))
      .withColumn("ts_ms", expr("ts div 1000000"))
    runToParquet(stream, landingDir, checkpointDir).count()
  }

  /** Replay-safe ingest: the same source data delivered MORE THAN ONCE
    * (reader's resume path re-reads the binlog from the last checkpoint, so
    * overlap is the normal case — sources/mysql/streaming/iterator.go
    * re-enters at the stored offset) must land exactly once. The Spark-
    * native guard is stateful streaming `dropDuplicates` on the primary
    * key: first occurrence is emitted in its own micro-batch, every replay
    * is absorbed by the state store. State is one key per row — for
    * unbounded streams use `dropDuplicatesWithinWatermark` so keys older
    * than the lateness allowance evict (the contract reader gets from
    * monotonically increasing binlog positions).
    *
    * `stagedDir` holds the (possibly replayed) source files;
    * maxFilesPerTrigger=1 makes each file its own micro-batch, the worst
    * case for replay (the duplicate arrives AFTER its original committed).
    */
  def ingestReplaySafe(
      spark: SparkSession,
      stagedDir: String,
      landingDir: String,
      checkpointDir: String,
      pkCols: Seq[String],
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    // fresh-run idempotent like the other ingests: the staged REPLAY is the
    // input under test; landing/checkpoint are this run's outputs
    deleteRecursive(landingDir); deleteRecursive(checkpointDir)
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stagedDir)
      .dropDuplicates(pkCols)
    runToParquet(stream, landingDir, checkpointDir)
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

  /** Stream a parquet table path. FileStreamSource wants a directory: a
    * path that IS a directory (multi-file table, e.g. engine-written
    * part files) streams directly — hidden (_/.-prefixed) files are
    * filtered by the source; a single-FILE table path points at the parent
    * with a glob filter for that one file (a bare glob on the parent would
    * otherwise ingest sibling tables). Shared by the streaming ingests. */
  private[streaming] def fileStream(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    // Resolve directory-vs-file through the Hadoop FileSystem API so the
    // branch is correct on any supported filesystem (HDFS, S3A, local),
    // not just java.io-visible local paths.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.getFileStatus(hPath).isDirectory) {
      spark.readStream.schema(schema).parquet(path)
    } else {
      spark.readStream
        .schema(schema)
        .option("pathGlobFilter", hPath.getName)
        .parquet(hPath.getParent.toString)
    }
  }

  /** Run `f` with `spark.sql.shuffle.partitions` scoped to the streaming
    * STATE partition count, restoring the session value after (guide
    * §2.1/§2.2 partition sizing). Stateful streaming operators
    * (dropDuplicates[WithinWatermark], stream-stream joins, watermarked
    * aggregation) create one state store — and one delta + commit file per
    * MICRO-BATCH — per shuffle partition, and the count is PINNED into the
    * checkpoint at first start, so it must be sized to expected state
    * volume (keys per watermark horizon), never to whatever core count the
    * session happens to run with: state here measures kilobytes-per-key
    * horizons, and a core-count default charges every micro-batch a full
    * fan of near-empty state commits (measured by the r15 driver as
    * INVERSE scaling: stream_ttl_dedup 6.9 s at 8 cores vs 13.8 s at 32 —
    * same data, same query). foreachBatch loops get the same scope: their
    * per-batch keyed shuffles carry one micro-batch of rows, not a
    * battery-scale frame. `SPARK_GRAFT_STREAM_STATE_PARTITIONS` overrides
    * for production state volumes; the local default keeps the 8- and
    * 32-core benches on the SAME state layout so the driver's core-count
    * A/B measures compute scaling, not state-file count. */
  private[streaming] def withStatePartitions[T](spark: SparkSession)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key,
      sys.env.getOrElse("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8"))
    // restore only after the blocking run completes: streams clone the
    // session conf on their own thread, so restoring right after start()
    // would race the clone
    try f finally spark.conf.set(key, prev)
  }

  /** Run `stream` to a parquet landing zone with AvailableNow + checkpoint,
    * block to completion, and return the landed data. Shared by the
    * streaming ingests. */
  private[streaming] def runToParquet(
      stream: DataFrame,
      landingDir: String,
      checkpointDir: String,
      outputMode: Option[org.apache.spark.sql.streaming.OutputMode] = None): DataFrame = {
    withStatePartitions(stream.sparkSession) {
      val writer = stream.writeStream
        .format("parquet")
        .option("path", landingDir)
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
      val q = outputMode.fold(writer)(writer.outputMode).start()
      q.awaitTermination()
    }
    stream.sparkSession.read.parquet(landingDir)
  }

  /** Shared by the streaming ingests (EvolvingIngest, WatermarkAgg). */
  private[streaming] def deleteRecursive(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.deleteIfExists(f))
    }
  }
}
