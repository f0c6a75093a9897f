package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright. Read it as raw nanos (legacy conf) and surface both
    * the raw long (`ts_ns`) and a microsecond-truncated TIMESTAMP_NTZ
    * (`ts_ntz`) — the same truncation DuckDB applies when casting its
    * nanosecond timestamp to the native microsecond one, so oracle SQL can
    * use `CAST(ts AS TIMESTAMP)` for bit-identical values.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(p(dir, "events"))
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_ntz", expr("cast(timestamp_micros(ts_ns div 1000) as timestamp_ntz)"))
  }
}
