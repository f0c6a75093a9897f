package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** TEMPORARY r15 debug harness for the shape-4 SccSpec failure. */
class SccDebugSpec extends AnyFunSuite {
  import TestSpark._

  test("debug shape 4") {
    import TestSpark.spark.implicits._
    val n = 12
    val edges = ((0 until 5).map(i => (i, (i + 1) % 5)) ++
      (6 until 11).map(i => (i, if (i == 10) 6 else i + 1)) ++ Seq((4, 6)))
      .map { case (a, b) => (a.toLong, b.toLong) }
    val nodesDf = (0 until n).map(_.toLong).toDF("node")
    val edgesDf = edges.toDF("src", "dst")
    val es = edgesDf.select(col("src"), col("dst")).distinct().localCheckpoint(true)
    val a = es.select(col("src"), col("dst").as("mid"))
    val b = es.select(col("src").as("mid"), col("dst"))
    val sq = a.join(b, Seq("mid")).select(col("src"), col("dst"))
    System.err.println("[dbg] squared: " + sq.orderBy("src", "dst").collect()
      .map(r => s"${r.getLong(0)}->${r.getLong(1)}").mkString(" "))
    val out = graft.operators.Scc.components(nodesDf, edgesDf, localFinishBelow = 0L)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    System.err.println("[dbg] result: " + out.mkString(" "))
  }
}
