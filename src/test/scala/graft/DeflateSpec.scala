package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.{DeflateSize, Sketch}

class DeflateSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def dsize(s: String): Long =
    Seq(s).toDF("t").select(Sketch.column(DeflateSize(Sketch.expr(col("t")), 6)))
      .head().getLong(0)

  private def ref(s: String): Long = {
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(s.getBytes("UTF-8")); d.finish()
    val buf = new Array[Byte](1 << 16)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    d.end(); n
  }

  test("matches a direct Deflater run byte-for-byte in size") {
    val rnd = new scala.util.Random(9)
    val cases = Seq("", "a", "a" * 5000,
      (1 to 800).map(_ => rnd.nextPrintableChar()).mkString,
      "the quick brown fox " * 200, "päällekkäisyys ümlauts ́中文")
    cases.foreach(c => assert(dsize(c) === ref(c), s"len=${c.length}"))
  }

  test("repetitive text compresses much better than diverse text") {
    val rnd = new scala.util.Random(10)
    val diverse = (1 to 4000).map(_ => rnd.nextPrintableChar()).mkString
    val repetitive = "spam template block. " * 190 // ~same length
    val rDiverse = diverse.length.toDouble / dsize(diverse)
    val rRep = repetitive.length.toDouble / dsize(repetitive)
    assert(rRep > 5 * rDiverse, s"repetitive=$rRep diverse=$rDiverse")
  }

  test("tripling a document does not triple its compressed size") {
    val rnd = new scala.util.Random(11)
    (1 to 20).foreach { i =>
      val t = (1 to 100 + rnd.nextInt(2000)).map(_ => rnd.nextPrintableChar()).mkString
      assert(dsize(t + t + t) < 2 * dsize(t) + 64, s"case $i")
    }
  }
}
