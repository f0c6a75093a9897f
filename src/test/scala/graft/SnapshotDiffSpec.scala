package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SnapshotDiff

class SnapshotDiffSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("diff equals the per-row reference model (randomized membership, values, nulls)") {
    val rnd = new scala.util.Random(11)
    def snap(): Seq[(Long, String, Double)] = (1 to 300).flatMap { k =>
      if (rnd.nextInt(4) == 0) None
      else Some((k.toLong,
        if (rnd.nextInt(10) == 0) null else s"v${rnd.nextInt(3)}",
        rnd.nextInt(5).toDouble))
    }
    val r1 = snap()
    val r2 = snap()
    val got = SnapshotDiff.diff(r1.toDF("k", "sv", "dv"), r2.toDF("k", "sv", "dv"), Seq("k"))
      .collect().map(r => r.getAs[Long]("k") -> r).toMap
    val m1 = r1.map(t => t._1 -> t).toMap
    val m2 = r2.map(t => t._1 -> t).toMap
    val expected = (m1.keySet ++ m2.keySet).flatMap { k =>
      (m1.get(k), m2.get(k)) match {
        case (None, Some(_))               => Some(k -> "c")
        case (Some(_), None)               => Some(k -> "d")
        case (Some(a), Some(b)) if a != b  => Some(k -> "u")
        case _                             => None
      }
    }.toMap
    assert(got.view.mapValues(_.getAs[String]("op")).toMap === expected)
    got.foreach { case (k, r) =>
      r.getAs[String]("op") match {
        case "c" =>
          assert(r.isNullAt(r.fieldIndex("before_dv")))
          assert(r.getAs[Double]("after_dv") === m2(k)._3)
        case "d" =>
          assert(r.isNullAt(r.fieldIndex("after_dv")))
          assert(r.getAs[Double]("before_dv") === m1(k)._3)
        case "u" =>
          assert(Option(r.getAs[String]("before_sv")) === Option(m1(k)._2))
          assert(Option(r.getAs[String]("after_sv")) === Option(m2(k)._2))
      }
    }
  }

  test("null-to-value and value-to-null are updates; identical nulls are unchanged") {
    val v1 = Seq((1L, null: String), (2L, "x"), (3L, null: String)).toDF("k", "s")
    val v2 = Seq((1L, "y"), (2L, null: String), (3L, null: String)).toDF("k", "s")
    val ops = SnapshotDiff.diff(v1, v2, Seq("k")).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("op")).toMap
    assert(ops === Map(1L -> "u", 2L -> "u"))
  }
}
