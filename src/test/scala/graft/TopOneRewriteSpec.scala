package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TopOneWindowToMinMaxBy: the row_number()=1 idiom must plan as a hash
  * aggregate (no Window, no sort) and return exactly the rows the window
  * form returns. */
class TopOneRewriteSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def topOne(df: DataFrame, desc: Boolean): DataFrame = {
    val ord = if (desc) Seq(col("o1").desc, col("o2").desc) else Seq(col("o1"), col("o2"))
    val w = Window.partitionBy("k").orderBy(ord: _*)
    df.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
  }

  test("rewritten plan has no Window; partials combine before the exchange") {
    val df = Seq((1L, 2L, 3L, "a")).toDF("k", "o1", "o2", "v")
    val plan = topOne(df, desc = true).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window survived the rewrite:\n$plan")
    // the scale win: map-side partial max_by means the exchange carries ONE
    // combined row per (task, key) instead of every input row, and the only
    // remaining sort is by the grouping key (SortAggregate over a struct
    // buffer), not the window's full (key, order) sort
    assert(plan.contains("partial_max_by"), plan)
    assert(plan.contains("max_by"), plan)
  }

  test("asc uses min_by, desc uses max_by; ranks > 1 do NOT rewrite") {
    val df = Seq((1L, 2L, 3L, "a")).toDF("k", "o1", "o2", "v")
    val asc = topOne(df, desc = false).queryExecution.executedPlan.toString
    assert(asc.contains("min_by") || asc.contains("MinBy"), asc)

    val w = Window.partitionBy("k").orderBy("o1")
    val rk2 = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
    assert(rk2.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("matches the window form on random data (nulls in order keys, ties)") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(300)((
      rnd.nextInt(20).toLong,
      if (rnd.nextInt(5) == 0) null else java.lang.Long.valueOf(rnd.nextInt(5).toLong),
      rnd.nextInt(4).toLong,
      s"v${rnd.nextInt(1000)}"))
    val df = rows.toDF("k", "o1", "o2", "v")

    for (desc <- Seq(false, true)) {
      val rewritten = topOne(df, desc).collect()
      val expected = {
        // compute the window answer without the rule: excludedRules kills it
        spark.conf.set("spark.sql.optimizer.excludedRules",
          "graft.plans.TopOneWindowToMinMaxBy")
        try topOne(df, desc).collect()
        finally spark.conf.unset("spark.sql.optimizer.excludedRules")
      }
      // both pick ONE row per key; under ties/null-dup keys the choice is
      // arbitrary but the (k, o1, o2) surviving KEY must agree, and where
      // the order is total the whole row must agree
      val got = rewritten.map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).sortBy(_._1)
      val exp = expected.map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).sortBy(_._1)
      assert(got.toSeq == exp.toSeq, s"desc=$desc")
      assert(rewritten.length == expected.length)
    }
  }

  test("extra filter conjuncts survive above the rewritten aggregate") {
    val df = Seq((1L, 1L, 1L, "keep"), (2L, 1L, 1L, "drop")).toDF("k", "o1", "o2", "v")
    val w = Window.partitionBy("k").orderBy("o1", "o2")
    val out = df.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("v") === "keep")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(out.collect().map(_.getString(3)).toSeq == Seq("keep"))
  }

  test("single nullable order key keeps row_number's null ranking (struct key)") {
    // asc NullsFirst: the null-ts row IS rank 1; a bare min_by key would
    // skip it (MaxMinBy ignores null ordering keys) — the struct key must
    // preserve it
    val df = Seq((1L, Some(5L), "v5"), (1L, None, "vnull"))
      .toDF("k", "ts", "v")
    val w = Window.partitionBy("k").orderBy(col("ts").asc)
    val out = df.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
    assert(!out.queryExecution.executedPlan.toString.contains("Window"))
    assert(out.select("v").head().getString(0) == "vnull")
  }

  test("empty partitionSpec does not rewrite (empty input must yield 0 rows)") {
    // parquet-backed source: a statically-empty LocalRelation would be
    // collapsed by PropagateEmptyRelation before our rule is reachable
    val df = graft.sources.Tables.documents(spark, Sf).where(col("doc_id") === -1L)
    val w = Window.orderBy("doc_id")
    val out = df.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
    assert(out.queryExecution.optimizedPlan.toString.contains("Window"))
    assert(out.count() == 0L)
  }

  test("non-uniform direction or non-default null ordering bails out") {
    val df = Seq((1L, 2L, 3L, "a")).toDF("k", "o1", "o2", "v")
    val mixed = Window.partitionBy("k").orderBy(col("o1").asc, col("o2").desc)
    val p1 = df.withColumn("rn", row_number().over(mixed)).where(col("rn") === 1)
      .queryExecution.executedPlan.toString
    assert(p1.contains("Window"), p1)

    val nullsLast = Window.partitionBy("k").orderBy(col("o1").asc_nulls_last)
    val p2 = df.withColumn("rn", row_number().over(nullsLast)).where(col("rn") === 1)
      .queryExecution.executedPlan.toString
    assert(p2.contains("Window"), p2)
  }
}
