package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc.{DdlEvent, SchemaEvolution => SE}

class SchemaEvolutionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import DdlEvent._

  test("parse handles the four ALTER TABLE shapes and rejects the rest") {
    assert(SE.parse("ALTER TABLE t ADD COLUMN c BIGINT") ===
      Some(AddColumn("c", LongType, None)))
    assert(SE.parse("alter table t add c decimal(12,2) default '0.00';") ===
      Some(AddColumn("c", DecimalType(12, 2), Some("0.00"))))
    assert(SE.parse("ALTER TABLE t DROP COLUMN c") === Some(DropColumn("c")))
    assert(SE.parse("ALTER TABLE t RENAME COLUMN a TO b") === Some(RenameColumn("a", "b")))
    assert(SE.parse("ALTER TABLE t MODIFY COLUMN c DOUBLE") ===
      Some(ModifyColumn("c", DoubleType)))
    assert(SE.parse("ALTER TABLE t ALTER COLUMN c TYPE VARCHAR(10)") ===
      Some(ModifyColumn("c", VarcharType(10))))
    assert(SE.parse("TRUNCATE TABLE t") === None)
    assert(SE.parse("ALTER TABLE t ADD PRIMARY KEY (id)") === None)
    // DEFAULT NULL is SQL null, not the string "NULL" (which would be cast
    // into every row — or abort the replay under ANSI for numeric types)
    assert(SE.parse("ALTER TABLE t ADD COLUMN c BIGINT DEFAULT NULL") ===
      Some(AddColumn("c", LongType, None)))
    assert(SE.parse("ALTER TABLE t ADD COLUMN c STRING DEFAULT null") ===
      Some(AddColumn("c", StringType, None)))
  }

  test("replaying a DDL sequence evolves both schema and data consistently") {
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.25)).toDF("id", "name", "value")
    val events = Seq(
      RenameColumn("value", "amount"),
      ModifyColumn("amount", DecimalType(12, 2)),
      AddColumn("flag", StringType, Some("new")),
      AddColumn("cents", LongType, None),
      DropColumn("name"))

    val evolved = SE.evolveAll(df.schema, events)
    assert(evolved.fieldNames.toSeq === Seq("id", "amount", "flag", "cents"))
    assert(evolved("amount").dataType === DecimalType(12, 2))

    val out = SE.replay(df, events)
    assert(out.schema.fieldNames.toSeq === Seq("id", "amount", "flag", "cents"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getDecimal(1).toPlainString === "1.50")
    assert(rows(0).getString(2) === "new")
    assert(rows(0).isNullAt(3))
  }

  test("evolve rejects contradictory events (add duplicate, drop missing)") {
    val schema = StructType(Seq(StructField("id", LongType)))
    intercept[IllegalArgumentException](SE.evolve(schema, AddColumn("id", LongType)))
    intercept[IllegalArgumentException](SE.evolve(schema, DropColumn("nope")))
    intercept[IllegalArgumentException](SE.evolve(schema, RenameColumn("nope", "x")))
  }

  test("applyEvent enforces the same preconditions as evolve (schema/data stay twins)") {
    val df = Seq((1L, "a")).toDF("id", "name")
    intercept[IllegalArgumentException](SE.applyEvent(df, AddColumn("id", LongType)))
    intercept[IllegalArgumentException](SE.applyEvent(df, DropColumn("nope")))
    intercept[IllegalArgumentException](SE.applyEvent(df, RenameColumn("nope", "x")))
    intercept[IllegalArgumentException](SE.applyEvent(df, ModifyColumn("nope", LongType)))
  }

  test("conformTo lets pre- and post-DDL batches coexist in one stream") {
    // old batch predates the ADD COLUMN and still has the pre-rename name
    val target = SE.evolveAll(
      StructType(Seq(StructField("id", LongType), StructField("amount", DoubleType))),
      Seq(AddColumn("tag", StringType, None)))
    val oldBatch = Seq((1L, 1.5)).toDF("id", "amount")
    val newBatch = Seq((2L, 2.5, "t")).toDF("id", "amount", "tag")
    val unioned = SE.conformTo(oldBatch, target).unionAll(SE.conformTo(newBatch, target))
    // names + types must match the evolved schema (nullability may tighten
    // when every contributing batch happens to be non-null)
    assert(unioned.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      target.fields.map(f => (f.name, f.dataType)).toSeq)
    val rows = unioned.orderBy("id").collect()
    assert(rows(0).isNullAt(2) && rows(1).getString(2) === "t")
  }
}
