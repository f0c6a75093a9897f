package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-evolution (DDL) events for the streaming path.
  *
  * Reference: lib/antlr/alter_table.go:12-235 — reader parses ALTER TABLE
  * statements into column events (add / drop / rename / modify with the new
  * data type) and applies them to its in-memory table schema so the CDC
  * stream keeps converting rows correctly after a migration (parse.go:83).
  * The ANTLR grammar itself is infra glue (SURVEY §2 out-of-scope); what is
  * re-expressed here is the EVENT MODEL and its application semantics:
  *
  *  - to a schema: fold events over a StructType;
  *  - to data: fold events over a DataFrame (add = typed default column,
  *    modify = cast, rename/drop = projection change) — all narrow
  *    projections, zero shuffle;
  *  - to a stream: [[conformTo]] projects ANY batch (pre- or post-DDL
  *    shape) onto the evolved schema, so late-arriving old-schema records
  *    coexist with new-schema ones — the exact problem reader solves by
  *    replaying DDL against its schema cache.
  */
sealed trait DdlEvent
object DdlEvent {
  /** ADD COLUMN name type [DEFAULT lit] — absent default = NULL column. */
  final case class AddColumn(name: String, dataType: DataType, default: Option[String] = None)
      extends DdlEvent
  final case class DropColumn(name: String) extends DdlEvent
  final case class RenameColumn(from: String, to: String) extends DdlEvent
  /** MODIFY/ALTER COLUMN name TYPE t — value semantics = cast. */
  final case class ModifyColumn(name: String, newType: DataType) extends DdlEvent
}

object SchemaEvolution {
  import DdlEvent._

  private val AddRe =
    """(?i)ALTER\s+TABLE\s+\S+\s+ADD\s+(?:COLUMN\s+)?(\w+)\s+([\w()\s,]+?)(?:\s+DEFAULT\s+(.+?))?\s*;?\s*$""".r
  private val DropRe =
    """(?i)ALTER\s+TABLE\s+\S+\s+DROP\s+(?:COLUMN\s+)?(\w+)\s*;?\s*$""".r
  private val RenameRe =
    """(?i)ALTER\s+TABLE\s+\S+\s+RENAME\s+(?:COLUMN\s+)?(\w+)\s+TO\s+(\w+)\s*;?\s*$""".r
  private val ModifyRe =
    """(?i)ALTER\s+TABLE\s+\S+\s+(?:MODIFY\s+(?:COLUMN\s+)?|ALTER\s+(?:COLUMN\s+)?)(\w+)\s+(?:TYPE\s+)?([\w()\s,]+?)\s*;?\s*$""".r

  /** Minimal DDL-string front door for the four event shapes (the ANTLR
    * grammar's job in the reference; alter_table.go:12-235 is the part
    * re-expressed — the events, not the parser). Unrecognized statements
    * yield None so callers can dead-letter them. */
  def parse(ddl: String): Option[DdlEvent] = ddl.trim match {
    case AddRe(name, typ, dflt) =>
      // an unparsable type (e.g. "ADD PRIMARY KEY (id)" shapes that slip
      // past the column regex) is not a column event — dead-letter it.
      // DEFAULT NULL is SQL null, not the four-character string "NULL"
      // (which would be cast into every row, or throw under ANSI for
      // non-string types).
      scala.util.Try(DataType.fromDDL(typ.trim)).toOption.map(dt =>
        AddColumn(name, dt, Option(dflt).map(_.trim)
          .filterNot(_.equalsIgnoreCase("NULL"))
          .map(_.stripPrefix("'").stripSuffix("'"))))
    case RenameRe(from, to) => Some(RenameColumn(from, to))
    case ModifyRe(name, typ) =>
      scala.util.Try(DataType.fromDDL(typ.trim)).toOption.map(ModifyColumn(name, _))
    case DropRe(name) => Some(DropColumn(name))
    case _ => None
  }

  /** Fold one event into a schema (alter_table.go's column-list mutation). */
  def evolve(schema: StructType, e: DdlEvent): StructType = e match {
    case AddColumn(n, dt, _) =>
      require(!schema.fieldNames.contains(n), s"column $n already exists")
      StructType(schema.fields :+ StructField(n, dt, nullable = true))
    case DropColumn(n) =>
      require(schema.fieldNames.contains(n), s"column $n not found")
      StructType(schema.fields.filterNot(_.name == n))
    case RenameColumn(from, to) =>
      require(schema.fieldNames.contains(from), s"column $from not found")
      StructType(schema.fields.map(f => if (f.name == from) f.copy(name = to) else f))
    case ModifyColumn(n, dt) =>
      require(schema.fieldNames.contains(n), s"column $n not found")
      StructType(schema.fields.map(f => if (f.name == n) f.copy(dataType = dt) else f))
  }

  def evolveAll(schema: StructType, events: Seq[DdlEvent]): StructType =
    events.foldLeft(schema)(evolve)

  /** Apply one event to data: every case is a narrow projection (no
    * shuffle), so a DDL replay over a 100 TB table is map-only. Enforces
    * the SAME preconditions as [[evolve]] — withColumnRenamed/drop would
    * otherwise silently no-op on a missing column and a duplicate add
    * would overwrite data, letting the schema cache and the data disagree
    * about which events applied. */
  def applyEvent(df: DataFrame, e: DdlEvent): DataFrame = e match {
    case AddColumn(n, dt, dflt) =>
      require(!df.columns.contains(n), s"column $n already exists")
      df.withColumn(n, dflt.map(d => lit(d).cast(dt)).getOrElse(lit(null).cast(dt)))
    case DropColumn(n) =>
      require(df.columns.contains(n), s"column $n not found")
      df.drop(n)
    case RenameColumn(from, to) =>
      require(df.columns.contains(from), s"column $from not found")
      df.withColumnRenamed(from, to)
    case ModifyColumn(n, dt) =>
      require(df.columns.contains(n), s"column $n not found")
      df.withColumn(n, col(n).cast(dt))
  }

  def replay(df: DataFrame, events: Seq[DdlEvent]): DataFrame =
    events.foldLeft(df)(applyEvent)

  /** Project a batch of ANY historical shape onto the evolved schema:
    * present columns are cast to the target type, columns the batch
    * predates become typed NULLs. This is what lets a checkpointed stream
    * keep running across a migration instead of assuming a frozen schema. */
  def conformTo(df: DataFrame, target: StructType): DataFrame = {
    val have = df.columns.toSet
    val cols: Seq[Column] = target.fields.toSeq.map { f =>
      if (have(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols: _*)
  }
}
