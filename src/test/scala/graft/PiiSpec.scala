package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => Tf}

class PiiSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(Tf.redactPii(col("t"))).head().getString(0)

  test("emails, IPs, and card runs are each replaced everywhere") {
    assert(redact("mail a.b+c@x-y.example.org and d@e.io end") ===
      "mail <EMAIL> and <EMAIL> end")
    assert(redact("from 10.0.0.1 to 192.168.255.254") === "from <IP> to <IP>")
    assert(redact("card 4111111111111111 or 36227206271667") ===
      "card <CARD> or <CARD>")
  }

  test("email is scrubbed before its domain can feed the IP pattern") {
    // the domain contains a dotted quad; one pass in the wrong order would
    // leave '<EMAIL 10.2.3.4>'-style hybrids
    assert(redact("x user@10.2.3.4.example.com y") === "x <EMAIL> y")
  }

  test("word boundaries: digit runs glued to more digits do not match") {
    // 17 digits: no 13-16 window has boundaries on both sides
    assert(redact("n 12345678901234567 m") === "n 12345678901234567 m")
    // dotted quad glued to a digit is not an IP boundary
    assert(redact("v1.2.3.45x") === "v1.2.3.45x")
  }

  test("redaction is idempotent (placeholders contain no digits or @)") {
    val once = redact("a@b.co 1.2.3.4 4111111111111111")
    assert(redact(once) === once)
  }

  test("syntactic by design: out-of-range octets still scrubbed") {
    assert(redact("999.999.999.999") === "<IP>")
  }
}
