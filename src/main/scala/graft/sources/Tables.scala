package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Typed loaders for the test corpus (TESTDATA.md).
  *
  * Mirrors the role of reader's per-source schema adapters
  * (reference: sources/postgres/snapshot.go, lib/mysql/schema.go): one place
  * that knows the physical layout and logical type mapping so every operator
  * downstream sees clean Spark types. All loads are plain parquet scans —
  * Catalyst pushes filters/projections into them (verified via
  * PushedFilters/ReadSchema in the physical plan).
  */
object Tables {
  private def p(dir: String, name: String) = s"$dir/$name.parquet"

  def region(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "region"))
  def nation(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "nation"))
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "customer"))
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "supplier"))
  def part(s: SparkSession, dir: String): DataFrame     = s.read.parquet(p(dir, "part"))
  def orders(s: SparkSession, dir: String): DataFrame   = s.read.parquet(p(dir, "orders"))
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "lineitem"))
  def documents(s: SparkSession, dir: String): DataFrame  = s.read.parquet(p(dir, "documents"))
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(p(dir, "embeddings"))

  /** The physical type of `events.ts` varies by testdata generation:
    * parquet TIMESTAMP(NANOS) — which Spark surfaces as a raw LONG under
    * `spark.sql.legacy.parquet.nanosAsLong` — or plain TIMESTAMP /
    * TIMESTAMP_NTZ at microsecond precision. These two helpers map ANY of
    * those physical shapes onto one canonical view so every operator
    * downstream is schema-generation-agnostic. Sessions pin
    * `spark.sql.session.timeZone=UTC`, so the NTZ→timestamp cast is exact
    * and the values match DuckDB's `epoch_ns(ts)` / `epoch_us(ts)` on the
    * same file. */
  def tsNanos(dt: DataType): Column = dt match {
    case LongType                         => col("ts")
    case TimestampType | TimestampNTZType => unix_micros(col("ts").cast("timestamp")) * 1000L
    case other => throw new IllegalArgumentException(s"unsupported events.ts type: $other")
  }

  /** Raw `ts` → TIMESTAMP at microsecond precision (for event-time
    * streaming: watermarks, windows, interval joins). */
  def tsTimestamp(dt: DataType): Column = dt match {
    case LongType                         => timestamp_micros(expr("ts div 1000"))
    case TimestampType | TimestampNTZType => col("ts").cast("timestamp")
    case other => throw new IllegalArgumentException(s"unsupported events.ts type: $other")
  }

  /** Canonical events view: the raw epoch-nanos long (`ts_ns`, in the
    * physical column position of `ts`) and a microsecond TIMESTAMP_NTZ
    * (`ts_ntz`) — the same µs truncation DuckDB applies reading the file,
    * so oracle SQL can use `CAST(ts AS TIMESTAMP)` for bit-identical
    * values whichever physical type this generation carries.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(p(dir, "events"))
    raw.withColumn("ts", tsNanos(raw.schema("ts").dataType))
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_ntz", expr("cast(timestamp_micros(ts_ns div 1000) as timestamp_ntz)"))
  }
}
