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
/** Column placement of an ADD/MODIFY COLUMN (types.go FirstPosition /
  * AfterPosition, extracted in alter_table.go processAddOrModifyColumn:
  * 131-191). Absent = append at the end, MySQL's default. */
sealed trait ColumnPosition
object ColumnPosition {
  case object First extends ColumnPosition
  final case class After(column: String) extends ColumnPosition
}

sealed trait DdlEvent
object DdlEvent {
  /** ADD COLUMN name type [DEFAULT lit] [FIRST | AFTER col] — absent
    * default = NULL column. */
  final case class AddColumn(
      name: String,
      dataType: DataType,
      default: Option[String] = None,
      position: Option[ColumnPosition] = None)
      extends DdlEvent
  final case class DropColumn(name: String) extends DdlEvent
  final case class RenameColumn(from: String, to: String) extends DdlEvent
  /** MODIFY/ALTER COLUMN name TYPE t [FIRST | AFTER col] — value semantics
    * = cast (+ optional move). */
  final case class ModifyColumn(
      name: String,
      newType: DataType,
      position: Option[ColumnPosition] = None)
      extends DdlEvent
  /** ADD PRIMARY KEY (a, b) — schema/data unchanged, key metadata only
    * (types.go AddPrimaryKeyEvent; alter_table.go:69-75,117-129). */
  final case class AddPrimaryKey(columns: Seq[String]) extends DdlEvent
}

/** Column descriptor carried by a CREATE TABLE event (types.go Column:
  * name, data type, optional default, primary-key flag). The type
  * vocabulary is Spark DDL — mapping source-native type names is the
  * converters' concern, same split the reference makes between its parser
  * events and lib/{mysql,postgres}/schema converters. */
final case class ColumnSpec(
    name: String,
    dataType: DataType,
    default: Option[String] = None,
    primaryKey: Boolean = false)

/** Table-LEVEL DDL events — the rest of the reference's event vocabulary
  * (create_table.go:1-176 columns+PK+defaults, drop_table.go:1-33 multi-
  * table, rename_table.go:1-44 pair list, processCopyTable for CREATE TABLE
  * LIKE, routed from parse.go's visit). A real CDC stream STARTS with
  * CreateTable: it is the event that seeds the schema history the stream
  * replays. */
sealed trait TableDdlEvent { def table: String }
object TableDdlEvent {
  final case class CreateTable(table: String, columns: Seq[ColumnSpec]) extends TableDdlEvent
  /** CREATE TABLE t LIKE from (processCopyTable). */
  final case class CopyTable(table: String, from: String) extends TableDdlEvent
  final case class DropTable(table: String) extends TableDdlEvent
  final case class RenameTable(table: String, newTable: String) extends TableDdlEvent
  /** A column event routed to its owning table (alter_table.go events). */
  final case class AlterTable(table: String, event: DdlEvent) extends TableDdlEvent
}

object SchemaEvolution {
  import DdlEvent._

  private val AddPkRe =
    """(?i)ALTER\s+TABLE\s+\S+\s+ADD\s+PRIMARY\s+KEY\s*\(([^)]*)\)\s*;?\s*$""".r
  private val AddRe =
    """(?i)ALTER\s+TABLE\s+\S+\s+ADD\s+(?:COLUMN\s+)?(\w+)\s+([\w()\s,]+?)(?:\s+DEFAULT\s+(.+?))?(?:\s+(FIRST)|\s+AFTER\s+(\w+))?\s*;?\s*$""".r
  private val DropRe =
    """(?i)ALTER\s+TABLE\s+\S+\s+DROP\s+(?:COLUMN\s+)?(\w+)\s*;?\s*$""".r
  private val RenameRe =
    """(?i)ALTER\s+TABLE\s+\S+\s+RENAME\s+(?:COLUMN\s+)?(\w+)\s+TO\s+(\w+)\s*;?\s*$""".r
  private val ModifyRe =
    """(?i)ALTER\s+TABLE\s+\S+\s+(?:MODIFY\s+(?:COLUMN\s+)?|ALTER\s+(?:COLUMN\s+)?)(\w+)\s+(?:TYPE\s+)?([\w()\s,]+?)(?:\s+(FIRST)|\s+AFTER\s+(\w+))?\s*;?\s*$""".r

  private def position(first: String, afterCol: String): Option[ColumnPosition] =
    if (first != null) Some(ColumnPosition.First)
    else Option(afterCol).map(ColumnPosition.After)

  /** Minimal DDL-string front door for the ALTER event shapes (the ANTLR
    * grammar's job in the reference; alter_table.go:12-235 is the part
    * re-expressed — the events, not the parser). Unrecognized statements
    * yield None so callers can dead-letter them. */
  def parse(ddl: String): Option[DdlEvent] = ddl.trim match {
    case AddPkRe(names) =>
      val cols = names.split(",").map(_.trim.stripPrefix("`").stripSuffix("`")).toSeq
      if (cols.nonEmpty && cols.forall(_.matches("\\w+"))) Some(AddPrimaryKey(cols))
      else None
    case AddRe(name, typ, dflt, first, afterCol) =>
      // an unparsable type is not a column event — dead-letter it.
      // DEFAULT NULL is SQL null, not the four-character string "NULL"
      // (which would be cast into every row, or throw under ANSI for
      // non-string types).
      scala.util.Try(DataType.fromDDL(typ.trim)).toOption.map(dt =>
        AddColumn(name, dt, Option(dflt).map(_.trim)
          .filterNot(_.equalsIgnoreCase("NULL"))
          .map(_.stripPrefix("'").stripSuffix("'")),
          position(first, afterCol)))
    case RenameRe(from, to) => Some(RenameColumn(from, to))
    case ModifyRe(name, typ, first, afterCol) =>
      scala.util.Try(DataType.fromDDL(typ.trim)).toOption
        .map(ModifyColumn(name, _, position(first, afterCol)))
    case DropRe(name) => Some(DropColumn(name))
    case _ => None
  }

  /** Insert index for a positioned column over the CURRENT field list. */
  private def insertIndex(
      names: Seq[String], pos: Option[ColumnPosition], atEnd: Int): Int = pos match {
    case None => atEnd
    case Some(ColumnPosition.First) => 0
    case Some(ColumnPosition.After(c)) =>
      val i = names.indexOf(c)
      require(i >= 0, s"column $c not found")
      i + 1
  }

  /** Fold one event into a schema (alter_table.go's column-list mutation). */
  def evolve(schema: StructType, e: DdlEvent): StructType = e match {
    case AddColumn(n, dt, _, pos) =>
      require(!schema.fieldNames.contains(n), s"column $n already exists")
      val idx = insertIndex(schema.fieldNames.toSeq, pos, schema.fields.length)
      val (before, after) = schema.fields.splitAt(idx)
      StructType((before :+ StructField(n, dt, nullable = true)) ++ after)
    case DropColumn(n) =>
      require(schema.fieldNames.contains(n), s"column $n not found")
      StructType(schema.fields.filterNot(_.name == n))
    case RenameColumn(from, to) =>
      require(schema.fieldNames.contains(from), s"column $from not found")
      StructType(schema.fields.map(f => if (f.name == from) f.copy(name = to) else f))
    case ModifyColumn(n, dt, pos) =>
      require(schema.fieldNames.contains(n), s"column $n not found")
      val updated = schema.fields.map(f => if (f.name == n) f.copy(dataType = dt) else f)
      pos match {
        case None => StructType(updated)
        case _ =>
          // move the (re-typed) column: remove, then insert at the target
          // slot computed over the REMAINING names — MySQL's AFTER refers
          // to the layout without the moving column
          val moving = updated.find(_.name == n).get
          val rest = updated.filterNot(_.name == n)
          val idx = insertIndex(rest.map(_.name).toSeq, pos, rest.length)
          val (before, after) = rest.splitAt(idx)
          StructType((before :+ moving) ++ after)
      }
    case AddPrimaryKey(cols) =>
      cols.foreach(c => require(schema.fieldNames.contains(c), s"column $c not found"))
      schema // key metadata only; the history tracks it per table
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
    case AddColumn(n, dt, dflt, pos) =>
      require(!df.columns.contains(n), s"column $n already exists")
      val added = df.withColumn(n, dflt.map(d => lit(d).cast(dt)).getOrElse(lit(null).cast(dt)))
      // positioned adds re-project into the evolved column order (still a
      // narrow map-only projection); the evolved schema is the order oracle
      if (pos.isEmpty) added
      else added.select(evolve(df.schema, e).fieldNames.map(col).toSeq: _*)
    case DropColumn(n) =>
      require(df.columns.contains(n), s"column $n not found")
      df.drop(n)
    case RenameColumn(from, to) =>
      require(df.columns.contains(from), s"column $from not found")
      df.withColumnRenamed(from, to)
    case ModifyColumn(n, dt, pos) =>
      require(df.columns.contains(n), s"column $n not found")
      val cast = df.withColumn(n, col(n).cast(dt))
      if (pos.isEmpty) cast
      else cast.select(evolve(df.schema, e).fieldNames.map(col).toSeq: _*)
    case AddPrimaryKey(cols) =>
      cols.foreach(c => require(df.columns.contains(c), s"column $c not found"))
      df // key metadata only
  }

  def replay(df: DataFrame, events: Seq[DdlEvent]): DataFrame =
    events.foldLeft(df)(applyEvent)

  // ---- table-level statements + schema history ----

  private val CreateLikeRe =
    """(?is)^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?`?(\w+)`?\s+LIKE\s+`?(\w+)`?\s*;?\s*$""".r
  // trailing table options (ENGINE=InnoDB DEFAULT CHARSET=... etc.) are
  // accepted and ignored — the near-universal real-binlog CREATE shape
  private val CreateRe =
    """(?is)^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?`?(\w+)`?\s*\((.+)\)\s*([\w =]+?)?\s*;?\s*$""".r
  private val DropTableRe =
    """(?is)^DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(.+?)\s*;?\s*$""".r
  private val RenameTableRe =
    """(?is)^RENAME\s+TABLE\s+(.+?)\s*;?\s*$""".r
  private val RenamePairRe = """(?is)^`?(\w+)`?\s+TO\s+`?(\w+)`?$""".r
  private val AlterTableNameRe = """(?is)^ALTER\s+TABLE\s+`?(\w+)`?\s+.*$""".r
  private val PkConstraintRe = """(?is)^PRIMARY\s+KEY\s*\(([^)]*)\)$""".r
  // name, type (reluctant), then DEFAULT and/or PRIMARY KEY in either order
  private val ColumnDefRe =
    """(?is)^`?(\w+)`?\s+(.+?)(\s+PRIMARY\s+KEY)?(?:\s+DEFAULT\s+(.+?))?(\s+PRIMARY\s+KEY)?\s*$""".r

  /** Split a CREATE TABLE body on top-level commas (parens nest: types like
    * DECIMAL(12,2) and PRIMARY KEY (a, b) keep their commas; single-quoted
    * spans are opaque, so DEFAULT 'a,b' or DEFAULT '(' never split or
    * unbalance). */
  private def splitTopLevel(body: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inQuote = false
    body.foreach {
      case '\'' => inQuote = !inQuote; cur += '\''
      case '(' if !inQuote => depth += 1; cur += '('
      case ')' if !inQuote => depth -= 1; cur += ')'
      case ',' if !inQuote && depth == 0 => out += cur.result().trim; cur.clear()
      case c => cur += c
    }
    val last = cur.result().trim
    if (last.nonEmpty) out += last
    out.toSeq
  }

  private def parseCreateBody(table: String, body: String): Option[TableDdlEvent.CreateTable] = {
    val items = splitTopLevel(body)
    val cols = scala.collection.mutable.ArrayBuffer.empty[ColumnSpec]
    val tablePks = scala.collection.mutable.ArrayBuffer.empty[String]
    items.foreach {
      case PkConstraintRe(names) =>
        // table-level PRIMARY KEY (a, b) sets the flag on declared columns
        // (processPrimaryKeyConstraintNode); a name with no column = reject
        tablePks ++= names.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
      case ColumnDefRe(name, typ, pk1, dflt, pk2) =>
        scala.util.Try(DataType.fromDDL(typ.trim)).toOption match {
          case Some(dt) =>
            cols += ColumnSpec(name, dt,
              Option(dflt).map(_.trim)
                .filterNot(_.equalsIgnoreCase("NULL"))
                .map(_.stripPrefix("'").stripSuffix("'")),
              primaryKey = pk1 != null || pk2 != null)
          case None => return None // unparsable column type: reject the event
        }
      case _ => return None
    }
    if (cols.isEmpty) return None // failed to extract columns (create_table.go)
    if (tablePks.exists(pk => !cols.exists(_.name == pk))) return None // unknown PK column
    Some(TableDdlEvent.CreateTable(table,
      cols.toSeq.map(c => c.copy(primaryKey = c.primaryKey || tablePks.contains(c.name)))))
  }

  /** Parse ONE statement into table-level events — the parse.go routing:
    * CREATE (columns or LIKE), DROP (possibly multi-table), RENAME
    * (possibly multi-pair), ALTER (wrapping the column-event parser).
    * Unrecognized/malformed statements yield Nil so callers can
    * dead-letter them. */
  def parseStatement(ddl: String): Seq[TableDdlEvent] = ddl.trim match {
    case CreateLikeRe(t, from) => Seq(TableDdlEvent.CopyTable(t, from))
    case CreateRe(t, body, _) => parseCreateBody(t, body).toSeq
    case RenameTableRe(pairs) =>
      val parsed = splitTopLevel(pairs).map {
        case RenamePairRe(from, to) => Some(TableDdlEvent.RenameTable(from, to))
        case _ => None
      }
      // all-or-nothing like processRenameTable's pair validation
      if (parsed.nonEmpty && parsed.forall(_.isDefined)) parsed.flatten else Nil
    case DropTableRe(names) =>
      val tables = splitTopLevel(names).map(_.stripPrefix("`").stripSuffix("`"))
      if (tables.nonEmpty && tables.forall(_.matches("\\w+")))
        tables.map(TableDdlEvent.DropTable)
      else Nil
    case s @ AlterTableNameRe(t) =>
      parse(s).map(TableDdlEvent.AlterTable(t, _)).toSeq
    case _ => Nil
  }

  /** One table's cached shape: schema + primary-key columns (the reference
    * carries PrimaryKey per column through every event). */
  final case class TableState(schema: StructType, primaryKeys: Seq[String])

  /** The schema-history cache: table name -> current state. This is what
    * the reference's in-memory table map is (parse.go events applied by the
    * binlog consumer); O(tables) driver-side bytes, never row data. */
  type History = Map[String, TableState]

  /** The StructType a CREATE TABLE event declares. */
  def createSchema(cols: Seq[ColumnSpec]): StructType =
    StructType(cols.map(c => StructField(c.name, c.dataType, nullable = true)))

  def applyTableEvent(h: History, e: TableDdlEvent): History = e match {
    case TableDdlEvent.CreateTable(t, cols) =>
      require(!h.contains(t), s"table $t already exists")
      h + (t -> TableState(createSchema(cols), cols.filter(_.primaryKey).map(_.name)))
    case TableDdlEvent.CopyTable(t, from) =>
      require(h.contains(from), s"table $from not found")
      require(!h.contains(t), s"table $t already exists")
      h + (t -> h(from))
    case TableDdlEvent.DropTable(t) =>
      require(h.contains(t), s"table $t not found")
      h - t
    case TableDdlEvent.RenameTable(t, nt) =>
      require(h.contains(t), s"table $t not found")
      require(!h.contains(nt), s"table $nt already exists")
      (h - t) + (nt -> h(t))
    case TableDdlEvent.AlterTable(t, ev) =>
      require(h.contains(t), s"table $t not found")
      val st = h(t)
      // a rename of a PK column renames the tracked key with it
      val pks = ev match {
        case DdlEvent.RenameColumn(from, to) =>
          st.primaryKeys.map(k => if (k == from) to else k)
        case DdlEvent.DropColumn(n) => st.primaryKeys.filterNot(_ == n)
        case DdlEvent.AddPrimaryKey(cols) =>
          // MySQL rejects a second primary key ("Multiple primary key
          // defined") — the history enforces the same invariant
          require(st.primaryKeys.isEmpty, s"table $t already has a primary key")
          cols
        case _ => st.primaryKeys
      }
      h.updated(t, TableState(evolve(st.schema, ev), pks))
  }

  def replayHistory(statements: Seq[String], initial: History = Map.empty): History =
    statements.flatMap(parseStatement).foldLeft(initial)(applyTableEvent)

  /** Data twin of the schema history: fold table-level DDL over actual
    * DataFrames. CREATE registers the caller's landed snapshot conformed to
    * the declared schema (or an empty typed table when none landed yet);
    * ALTER projects (narrow, zero-shuffle), RENAME re-keys, DROP removes,
    * COPY LIKE starts empty with the source's current schema. */
  def replayTables(
      spark: org.apache.spark.sql.SparkSession,
      statements: Seq[String],
      seeds: Map[String, DataFrame]): Map[String, DataFrame] = {
    def empty(schema: StructType): DataFrame =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val events = statements.flatMap(parseStatement)
    val (_, data) = events.foldLeft((Map.empty: History, Map.empty[String, DataFrame])) {
      case ((h, d), e) =>
        val h2 = applyTableEvent(h, e)
        val d2 = e match {
          case TableDdlEvent.CreateTable(t, _) =>
            d + (t -> seeds.get(t).map(conformTo(_, h2(t).schema)).getOrElse(empty(h2(t).schema)))
          case TableDdlEvent.CopyTable(t, _) => d + (t -> empty(h2(t).schema))
          case TableDdlEvent.DropTable(t) => d - t
          case TableDdlEvent.RenameTable(t, nt) => (d - t) + (nt -> d(t))
          case TableDdlEvent.AlterTable(t, ev) => d.updated(t, applyEvent(d(t), ev))
        }
        (h2, d2)
    }
    data
  }

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
