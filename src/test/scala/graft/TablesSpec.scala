package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** The PHYSICAL type of `events.ts` changed across testdata generations:
  * parquet TIMESTAMP(NANOS) (surfaced as a raw long under
  * `spark.sql.legacy.parquet.nanosAsLong`) through round 8, plain
  * microsecond TIMESTAMP/TIMESTAMP_NTZ from round 9's regeneration — the
  * round-9 driver gate lost every events-backed query to exactly this
  * drift. Pin the loader's contract so it can never regress silently:
  * whatever physical shape the file carries, `Tables.events` yields the
  * same canonical (ts_ns epoch-nanos long, ts_ntz µs TIMESTAMP_NTZ) view.
  */
class TablesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("events loader normalizes long-nanos, TIMESTAMP, and TIMESTAMP_NTZ generations identically") {
    // nanos deliberately NOT µs-aligned: ...789 ns documents the truncation
    val base = Seq(
      (1L, 1704067200123456789L, 10L, "click", 1.5, "{}"),
      (2L, 1704070800987654321L, 11L, "view", 2.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val work = java.nio.file.Files.createTempDirectory("tables_spec").toString
    def gen(name: String)(f: DataFrame => DataFrame): String = {
      f(base).coalesce(1).write.mode("overwrite").parquet(s"$work/$name/events.parquet")
      s"$work/$name"
    }
    val usec = (df: DataFrame) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val genLong = gen("long")(identity) // pre-r9 shape: raw int64 nanos
    val genTs   = gen("ts")(usec)
    val genNtz  = gen("ntz")(d => usec(d).withColumn("ts", col("ts").cast("timestamp_ntz")))

    def load(dir: String) = Tables.events(spark, dir)
      .select("event_id", "ts_ns", "ts_ntz").orderBy("event_id")

    val Seq(outLong, outTs, outNtz) = Seq(genLong, genTs, genNtz).map(load)
    // identical canonical schema whatever the physical input type
    assert(outLong.schema == outTs.schema && outTs.schema == outNtz.schema)

    val rowsLong = outLong.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.get(2)))
    val rowsTs   = outTs.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.get(2)))
    val rowsNtz  = outNtz.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.get(2)))
    // µs-precision generations agree bit-for-bit with each other and equal
    // the nano generation truncated to µs (the same truncation DuckDB
    // applies reading the file, so oracle agreement is per-generation exact)
    val longTrunc = rowsLong.map { case (id, ns, ntz) => (id, ns / 1000L * 1000L, ntz) }
    assert(rowsTs == longTrunc)
    assert(rowsNtz == longTrunc)
    // ts_ntz identical across ALL generations (µs-truncated on every path)
    assert(outLong.select("ts_ntz").collect().toSeq == outTs.select("ts_ntz").collect().toSeq)
  }
}
