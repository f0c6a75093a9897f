package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{IncrementalAgg, SnapshotDiff}

class IncrementalAggSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def collectState(df: DataFrame): Map[String, (Long, BigDecimal)] =
    df.collect().map { r =>
      r.getAs[String]("g") ->
        ((r.getAs[Long]("cnt"), BigDecimal(r.getAs[java.math.BigDecimal]("total"))))
    }.toMap

  test("maintained state equals a full recompute (randomized; migrations + emptied groups)") {
    val rnd = new scala.util.Random(23)
    def snap(): Seq[(Long, String, Double)] = (1 to 400).flatMap { k =>
      if (rnd.nextInt(4) == 0) None
      else Some((k.toLong, s"g${rnd.nextInt(5)}", rnd.nextInt(100000) / 100.0))
    }
    val r1 = snap()
    // remap every g4 row to g0 in v2: g4 must EMPTY via deletes/updates
    val r2 = snap().map { case (k, g, v) => (k, if (g == "g4") "g0" else g, v) }
    def mk(rows: Seq[(Long, String, Double)]) = rows.toDF("k", "g", "v")
      .select(col("k"), col("g"), col("v").cast("decimal(12,2)").as("vd"))
    val v1 = mk(r1)
    val v2 = mk(r2)
    val events = SnapshotDiff.diff(v1, v2, Seq("k"))
    // the scenario must actually exercise group-moving updates
    assert(events.where(col("op") === "u" &&
      col("before_g") =!= col("after_g")).count() > 0)
    val base = v1.groupBy("g").agg(count(lit(1)).as("cnt"), sum("vd").as("total"))
    val got = collectState(IncrementalAgg.maintain(base, events, "op",
      col("before_g"), col("after_g"), col("before_vd"), col("after_vd"), "g"))
    val exp = collectState(
      v2.groupBy("g").agg(count(lit(1)).as("cnt"), sum("vd").as("total")))
    assert(got === exp)
    assert(r1.exists(_._2 == "g4") && !got.contains("g4"))
  }

  test("a pure-insert batch onto empty base builds the aggregate from scratch") {
    val base = Seq.empty[(String, Long, java.math.BigDecimal)]
      .toDF("g", "cnt", "total")
      .select(col("g"), col("cnt"), col("total").cast("decimal(12,2)").as("total"))
    val events = Seq(("c", "a", 1.50), ("c", "a", 2.25), ("c", "b", 4.00))
      .toDF("op", "after_g", "after_v")
      .select(col("op"), lit(null: String).as("before_g"), col("after_g"),
        lit(null).cast("decimal(12,2)").as("before_vd"),
        col("after_v").cast("decimal(12,2)").as("after_vd"))
    val got = collectState(IncrementalAgg.maintain(base, events, "op",
      col("before_g"), col("after_g"), col("before_vd"), col("after_vd"), "g"))
    assert(got === Map("a" -> ((2L, BigDecimal("3.75"))), "b" -> ((1L, BigDecimal("4.00")))))
  }
}
