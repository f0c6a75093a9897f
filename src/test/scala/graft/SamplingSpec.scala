package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val df = (1L to 1000L).map(i => (i, if (i % 3 == 0) "a" else "b"))
    .toDF("id", "src")

  test("reservoir: exactly k per stratum, ranks 1..k, short strata kept whole") {
    val out = Sampling.reservoirPerKey(df, Seq("src"), "id", 7, "s1")
    val byKey = out.collect().groupBy(_.getAs[String]("src"))
    assert(byKey.keySet === Set("a", "b"))
    byKey.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq === (1L to 7L))
    }
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("id", "src")
    assert(Sampling.reservoirPerKey(tiny, Seq("src"), "id", 7, "s1").count() === 2L)
  }

  test("reservoir: identical sample under repartition (order-free, unlike Vitter's R)") {
    val a = Sampling.reservoirPerKey(df, Seq("src"), "id", 9, "s2")
      .select("src", "rk", "id").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = Sampling.reservoirPerKey(df.repartition(11), Seq("src"), "id", 9, "s2")
      .select("src", "rk", "id").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a === b)
  }

  test("reservoir: different salts draw different samples (resample lever)") {
    val a = Sampling.reservoirPerKey(df, Seq("src"), "id", 20, "s3")
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.reservoirPerKey(df, Seq("src"), "id", 20, "s4")
      .select("id").collect().map(_.getLong(0)).toSet
    assert((a -- b).nonEmpty)
  }

  test("reservoir: hash-rank sample is spread across the id range, not a prefix") {
    val out = Sampling.reservoirPerKey(df, Seq("src"), "id", 50, "s5")
      .where(col("src") === "b").select("id").collect().map(_.getLong(0))
    // a head-of-stream sample would sit entirely below ~75; hash ranking
    // should land draws in both halves of the 1..1000 range
    assert(out.count(_ <= 500) >= 10 && out.count(_ > 500) >= 10)
  }

  test("reservoir plans WindowGroupLimit: per-task top-k before the exchange") {
    val plan = Sampling.reservoirPerKey(df, Seq("src"), "id", 5, "s6")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }
}
