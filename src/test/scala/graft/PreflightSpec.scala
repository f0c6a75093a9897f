package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Preflight

class PreflightSpec extends AnyFunSuite {
  import TestSpark._

  private val events = s"$Sf/events.parquet"

  test("green path: readable source, writable checkpoint, temporal watermark column") {
    val ckpt = Files.createTempDirectory("preflight-ok").toString
    val checks = Preflight.validate(spark, events, s"$ckpt/sub", Some("ts"))
    assert(checks.forall(_.ok), checks.filterNot(_.ok).toString)
    Preflight.requireStreamable(spark, events, s"$ckpt/sub", Some("ts"))
  }

  test("missing source fails source_readable only") {
    val ckpt = Files.createTempDirectory("preflight-src").toString
    val checks = Preflight.validate(spark, "/nonexistent/nope.parquet", ckpt)
    assert(checks.find(_.name == "source_readable").exists(!_.ok))
    assert(checks.find(_.name == "checkpoint_writable").exists(_.ok))
  }

  test("checkpoint under a plain FILE is not writable") {
    val f = Files.createTempFile("preflight-file", ".tmp")
    val checks = Preflight.validate(spark, events, s"$f/sub")
    assert(checks.find(_.name == "checkpoint_writable").exists(!_.ok))
  }

  test("absent and non-temporal watermark columns are rejected, named in the error") {
    val ckpt = Files.createTempDirectory("preflight-wm").toString
    val absent = Preflight.validate(spark, events, ckpt, Some("no_such_col"))
    assert(absent.find(_.name == "watermark_column").exists(!_.ok))
    val wrongType = Preflight.validate(spark, events, ckpt, Some("event_type"))
    assert(wrongType.find(_.name == "watermark_column").exists(!_.ok))
    val ex = intercept[IllegalArgumentException] {
      Preflight.requireStreamable(spark, events, ckpt, Some("no_such_col"),
        schemaHistorySeeded = false)
    }
    assert(ex.getMessage.contains("watermark_column"))
    assert(ex.getMessage.contains("schema_history_seeded"))
  }
}
