package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.BucketedJoin
import graft.sources.Tables

class BucketedJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed fact-fact join plans with no exchange and matches the plain join") {
    val orders = Tables.orders(spark, Sf).select("o_orderkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, Sf).select("l_orderkey", "l_quantity")
    BucketedJoin.writeBucketed(orders, "graft_bkt_orders", "o_orderkey", 8)
    BucketedJoin.writeBucketed(lineitem, "graft_bkt_lineitem", "l_orderkey", 8)

    // force the shuffle-join path (tiny test tables would broadcast)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = BucketedJoin.colocatedJoin(
        spark, "graft_bkt_orders", "graft_bkt_lineitem", "o_orderkey", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString

      // the whole point: co-located bucket scans feed the sort-merge join
      // with NO Exchange on either side. (A partition-local Sort remains:
      // Spark 3+ ignores bucket sort metadata by default —
      // spark.sql.legacy.bucketedTableScan.outputOrdering — and a local
      // sort is linear and shuffle-free, so the scale cost that matters is
      // the eliminated exchange.)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ over buckets:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")

      val expected = orders.join(lineitem, col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    }
  }
}
