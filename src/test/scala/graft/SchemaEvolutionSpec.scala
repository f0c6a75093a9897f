package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.cdc.{ColumnSpec, DdlEvent, TableDdlEvent, SchemaEvolution => SE}

class SchemaEvolutionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._
  import DdlEvent._
  import TableDdlEvent._

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
    assert(SE.parse("ALTER TABLE t ADD PRIMARY KEY (id)") ===
      Some(AddPrimaryKey(Seq("id"))))
    assert(SE.parse("ALTER TABLE t ADD PRIMARY KEY (a, b)") ===
      Some(AddPrimaryKey(Seq("a", "b"))))
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

  test("FIRST/AFTER column positions parse and move schema + data together") {
    import graft.cdc.ColumnPosition.{After, First}
    assert(SE.parse("ALTER TABLE t ADD COLUMN c BIGINT FIRST") ===
      Some(AddColumn("c", LongType, None, Some(First))))
    assert(SE.parse("ALTER TABLE t ADD COLUMN c BIGINT DEFAULT '7' AFTER b") ===
      Some(AddColumn("c", LongType, Some("7"), Some(After("b")))))
    assert(SE.parse("ALTER TABLE t MODIFY COLUMN c DOUBLE AFTER a") ===
      Some(ModifyColumn("c", DoubleType, Some(After("a")))))
    val df = Seq((1L, "x", 2.5)).toDF("a", "b", "c")
    val out = SE.replay(df, Seq(
      AddColumn("z", LongType, Some("9"), Some(First)),
      AddColumn("m", StringType, None, Some(After("a"))),
      ModifyColumn("c", StringType, Some(After("z")))))
    assert(out.columns.toSeq === Seq("z", "c", "a", "m", "b"))
    assert(SE.evolveAll(df.schema, Seq(
      AddColumn("z", LongType, Some("9"), Some(First)),
      AddColumn("m", StringType, None, Some(After("a"))),
      ModifyColumn("c", StringType, Some(After("z"))))).fieldNames.toSeq ===
      out.columns.toSeq) // schema fold and data replay stay twins
    val row = out.head()
    assert(row.getLong(0) === 9L && row.getString(1) === "2.5")
    intercept[IllegalArgumentException](
      SE.evolve(df.schema, AddColumn("q", LongType, None, Some(After("nope")))))
  }

  test("ADD PRIMARY KEY tracks in the history, once, and leaves data alone") {
    val h = SE.replayHistory(Seq(
      "CREATE TABLE t (id BIGINT, v DOUBLE)",
      "ALTER TABLE t ADD PRIMARY KEY (id, v)"))
    assert(h("t").primaryKeys === Seq("id", "v"))
    assert(h("t").schema.fieldNames.toSeq === Seq("id", "v"))
    // second PK rejected (MySQL: "Multiple primary key defined")
    intercept[IllegalArgumentException](
      SE.applyTableEvent(h, AlterTable("t", AddPrimaryKey(Seq("v")))))
    // unknown column rejected
    val h2 = SE.replayHistory(Seq("CREATE TABLE u (a BIGINT)"))
    intercept[IllegalArgumentException](
      SE.applyTableEvent(h2, AlterTable("u", AddPrimaryKey(Seq("zz")))))
    val df = Seq((1L, 2.5)).toDF("id", "v")
    assert(SE.applyEvent(df, AddPrimaryKey(Seq("id"))).collect().toSeq ===
      df.collect().toSeq)
  }

  test("parseStatement: CREATE TABLE with inline PK, table PK, defaults") {
    val got = SE.parseStatement(
      "CREATE TABLE t (id BIGINT PRIMARY KEY, name STRING, " +
        "amt DECIMAL(12,2) DEFAULT '0.00', note STRING DEFAULT NULL)")
    assert(got === Seq(CreateTable("t", Seq(
      ColumnSpec("id", LongType, None, primaryKey = true),
      ColumnSpec("name", StringType, None),
      ColumnSpec("amt", DecimalType(12, 2), Some("0.00")),
      ColumnSpec("note", StringType, None))))) // DEFAULT NULL = no default
    // composite table-level constraint flags both columns
    val comp = SE.parseStatement(
      "create table if not exists u (a bigint, b string, c double, primary key (a, b));")
    assert(comp === Seq(CreateTable("u", Seq(
      ColumnSpec("a", LongType, None, primaryKey = true),
      ColumnSpec("b", StringType, None, primaryKey = true),
      ColumnSpec("c", DoubleType, None)))))
    // PK constraint naming an undeclared column = rejected (create_table.go
    // returns an error when the column lookup fails)
    assert(SE.parseStatement("CREATE TABLE x (a BIGINT, PRIMARY KEY (zz))") === Nil)
    // no columns = rejected
    assert(SE.parseStatement("CREATE TABLE x ()") === Nil)
    // quoted commas/parens stay inside their default value (quote-aware
    // top-level split), and trailing table options are accepted and ignored
    assert(SE.parseStatement("CREATE TABLE q (s STRING DEFAULT 'a,b', t STRING DEFAULT '(x')") ===
      Seq(CreateTable("q", Seq(
        ColumnSpec("s", StringType, Some("a,b")),
        ColumnSpec("t", StringType, Some("(x"))))))
    assert(SE.parseStatement(
      "CREATE TABLE e (a BIGINT) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4") ===
      Seq(CreateTable("e", Seq(ColumnSpec("a", LongType, None)))))
  }

  test("parseStatement: CREATE LIKE, multi-DROP, multi-RENAME, ALTER routing") {
    assert(SE.parseStatement("CREATE TABLE copy1 LIKE src") ===
      Seq(CopyTable("copy1", "src")))
    assert(SE.parseStatement("DROP TABLE a, b, c;") ===
      Seq(DropTable("a"), DropTable("b"), DropTable("c")))
    assert(SE.parseStatement("RENAME TABLE a TO b, c TO d") ===
      Seq(RenameTable("a", "b"), RenameTable("c", "d")))
    // odd pair list is all-or-nothing rejected (rename_table.go)
    assert(SE.parseStatement("RENAME TABLE a TO b, c") === Nil)
    assert(SE.parseStatement("ALTER TABLE t ADD COLUMN c BIGINT") ===
      Seq(AlterTable("t", AddColumn("c", LongType, None))))
    assert(SE.parseStatement("SELECT 1") === Nil)
  }

  test("schema history: create/copy/alter/rename/drop fold; PK tracked through renames") {
    val h = SE.replayHistory(Seq(
      "CREATE TABLE t (id BIGINT PRIMARY KEY, v DOUBLE)",
      "CREATE TABLE t2 LIKE t",
      "ALTER TABLE t RENAME COLUMN id TO pk_id",
      "ALTER TABLE t ADD COLUMN w STRING",
      "RENAME TABLE t TO t3",
      "DROP TABLE t2"))
    assert(h.keySet === Set("t3"))
    assert(h("t3").schema.fieldNames.toSeq === Seq("pk_id", "v", "w"))
    assert(h("t3").primaryKeys === Seq("pk_id")) // rename followed the key
    // contradictory events reject, same as the column-level twins
    intercept[IllegalArgumentException](
      SE.applyTableEvent(h, DropTable("nope")))
    intercept[IllegalArgumentException](
      SE.applyTableEvent(h, CreateTable("t3", Seq(ColumnSpec("x", LongType)))))
    intercept[IllegalArgumentException](
      SE.applyTableEvent(h, RenameTable("t3", "t3")))
  }

  test("replayTables folds DDL over data: seed conforms, lineage survives rename") {
    val base = Seq((1L, 2.5), (2L, 3.5)).toDF("id", "v")
    val out = SE.replayTables(spark, Seq(
      "CREATE TABLE t (id BIGINT PRIMARY KEY, v DECIMAL(12,2))",
      "CREATE TABLE scratch (k BIGINT)",
      "ALTER TABLE t ADD COLUMN tag STRING DEFAULT 'x'",
      "RENAME TABLE t TO t2",
      "ALTER TABLE t2 RENAME COLUMN v TO amount",
      "DROP TABLE scratch"),
      seeds = Map("t" -> base))
    assert(out.keySet === Set("t2"))
    val rows = out("t2").orderBy("id").collect()
    assert(out("t2").schema.fieldNames.toSeq === Seq("id", "amount", "tag"))
    assert(rows(0).getDecimal(1).toPlainString === "2.50") // seed conformed to DDL type
    assert(rows(0).getString(2) === "x")
    // a CREATE with no landed seed is an empty typed table
    val empty = SE.replayTables(spark, Seq("CREATE TABLE e (a BIGINT)"), Map.empty)
    assert(empty("e").isEmpty && empty("e").schema.fieldNames.toSeq === Seq("a"))
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
