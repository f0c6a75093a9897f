package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Streaming preflight validation — the Spark twin of reader's
  * source-readiness checks (sources/mysql/validate.go:27-40: refuse to
  * start streaming unless `binlog_format = ROW`; the principle is "fail at
  * startup with a configuration message, not mid-stream with a decode
  * crash").
  *
  * The analogous invariants for a Structured-Streaming ingest:
  *  - the source path is readable and has a non-empty schema (the stream
  *    would otherwise fail on its first micro-batch);
  *  - the checkpoint location is writable (offset WAL + commits live
  *    there; an unwritable dir kills the query only at first commit);
  *  - the event-time/watermark column exists with an orderable temporal
  *    type (without it there are no dedup/lateness semantics — the moral
  *    equivalent of a non-ROW binlog format);
  *  - for schema-evolving streams, the schema history is seeded (a column
  *    event with no preceding CREATE TABLE has nothing to apply to —
  *    iterator.go:37-39 enforces the same ordering on its schema
  *    timestamps).
  *
  * All checks are driver-side and O(1) — one schema read, one probe file.
  */
object Preflight {

  final case class Check(name: String, ok: Boolean, detail: String)

  /** Run every applicable check; never throws (the report form, for
    * surfacing all failures at once). */
  def validate(
      spark: SparkSession,
      sourcePath: String,
      checkpointDir: String,
      watermarkCol: Option[String] = None,
      schemaHistorySeeded: Boolean = true): Seq[Check] = {

    // Read the source schema once; source_readable and watermark_column
    // both inspect it.
    val sourceSchema: Either[String, org.apache.spark.sql.types.StructType] =
      try Right(spark.read.parquet(sourcePath).schema)
      catch { case e: Exception => Left(e.getMessage) }

    val source = sourceSchema match {
      case Right(schema) if schema.isEmpty =>
        Check("source_readable", ok = false, s"$sourcePath has an empty schema")
      case Right(schema) =>
        Check("source_readable", ok = true, s"${schema.size} columns")
      case Left(msg) =>
        Check("source_readable", ok = false, s"$sourcePath: $msg")
    }

    val checkpoint =
      try {
        val dir = Paths.get(checkpointDir)
        Files.createDirectories(dir)
        val probe = Files.createTempFile(dir, ".preflight", ".probe")
        Files.delete(probe)
        Check("checkpoint_writable", ok = true, checkpointDir)
      } catch {
        case e: Exception =>
          Check("checkpoint_writable", ok = false, s"$checkpointDir: ${e.getMessage}")
      }

    val watermark = watermarkCol.map { c =>
      sourceSchema match {
        case Left(_) =>
          Check("watermark_column", ok = false, s"source unreadable, cannot inspect '$c'")
        case Right(schema) =>
          schema.find(_.name == c) match {
            case None =>
              Check("watermark_column", ok = false,
                s"'$c' not in source schema (${schema.fieldNames.mkString(", ")})")
            case Some(f) if Seq(TimestampType, TimestampNTZType, LongType).contains(f.dataType) =>
              Check("watermark_column", ok = true, s"'$c': ${f.dataType.simpleString}")
            case Some(f) =>
              Check("watermark_column", ok = false,
                s"'$c' has non-temporal type ${f.dataType.simpleString}")
          }
      }
    }

    val history =
      if (schemaHistorySeeded) Check("schema_history_seeded", ok = true, "seeded")
      else Check("schema_history_seeded", ok = false,
        "no CREATE TABLE in history before column events")

    Seq(source, checkpoint) ++ watermark ++ Seq(history)
  }

  /** The fail-fast form (validate.go's contract): throws with EVERY failing
    * check named, so one restart fixes all of them. */
  def requireStreamable(
      spark: SparkSession,
      sourcePath: String,
      checkpointDir: String,
      watermarkCol: Option[String] = None,
      schemaHistorySeeded: Boolean = true): Unit = {
    val failed = validate(spark, sourcePath, checkpointDir, watermarkCol,
      schemaHistorySeeded).filterNot(_.ok)
    require(failed.isEmpty,
      "stream preflight failed: " +
        failed.map(c => s"${c.name} (${c.detail})").mkString("; "))
  }
}
