package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sinks.BatchedSink
import graft.sources.Tables
import graft.storage.PersistedMap
import graft.streaming.EventsIngest

class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("persisted map survives reload and malformed tails") {
    val f = Files.createTempDirectory("pm").resolve("offsets.tsv").toString
    val m = PersistedMap(f)
    m.put("table.lineitem.last_pk", "12345")
    m.put("weird key\twith\ttabs", "value\nwith newline")
    val m2 = PersistedMap(f)
    assert(m2.get("table.lineitem.last_pk").contains("12345"))
    assert(m2.get("weird key\twith\ttabs").contains("value\nwith newline"))
    m2.remove("table.lineitem.last_pk")
    assert(PersistedMap(f).get("table.lineitem.last_pk").isEmpty)
  }

  test("batched sink manifest partitions the keyspace without loss") {
    val out = Files.createTempDirectory("sink").toString
    val li = Tables.lineitem(spark, Sf)
    val manifest = BatchedSink.writeBatched(li, "l_orderkey", 512L, out)
    val total = manifest.agg(sum("n_rows")).head().getLong(0)
    assert(total === li.count())
    // batch bounds nest inside the batch keyspan
    val bad = manifest.where(
      col("min_pk") < col("batch_id") * 512 || col("max_pk") >= (col("batch_id") + 1) * 512)
    assert(bad.count() === 0)
  }

  test("streaming AvailableNow ingest lands exactly the batch rows, checkpointed") {
    val work = Files.createTempDirectory("stream").toString
    val landed = EventsIngest.freshIngest(spark, s"$Sf/events.parquet", work)
    val batch = Tables.events(spark, Sf)
    assert(landed.count() === batch.count())
    // offsets were checkpointed (reader's persistedmap analogue)
    assert(Files.exists(java.nio.file.Paths.get(s"$work/ckpt/offsets")))
    // re-running with the same checkpoint ingests nothing new (exactly-once)
    val n2 = EventsIngest.ingestAvailableNow(
      spark, s"$Sf/events.parquet", s"$work/landing", s"$work/ckpt")
    assert(n2 === batch.count())
  }
}
