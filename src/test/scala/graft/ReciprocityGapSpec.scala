package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave-12 lanes against driver-side references on sf0.001. */
class ReciprocityGapSpec extends AnyFunSuite {
  import TestSpark._

  test("graph_reciprocity equals a driver-side reversed-edge count") {
    val r = SparkEntry.queries("graph_reciprocity")(spark, Sf).collect().head
    val cust = graft.sources.Tables.customer(spark, Sf)
      .selectExpr("cast(c_custkey as long) as node")
    val n = cust.count()
    import org.apache.spark.sql.functions._
    import graft.functions.{TextFunctions => Tf}
    val edges = cust.where(col("node") % 7 =!= 0)
      .select(col("node").as("src"), explode(array(
        pmod(Tf.hash60(concat(lit("pr-a-"), col("node").cast("string"))), lit(n)),
        pmod(Tf.hash60(concat(lit("pr-b-"), col("node").cast("string"))), lit(n))))
        .as("dst"))
      .where(col("src") =!= col("dst"))
      .join(cust.select(col("node").as("dst")), Seq("dst"), "left_semi")
      .distinct()
      .collect().map(x => (x.getAs[Long]("src"), x.getAs[Long]("dst"))).toSet
    val recip = edges.count { case (s0, d0) => edges.contains((d0, s0)) }.toLong
    assert(r.getLong(0) == edges.size.toLong)
    assert(r.getLong(1) == recip)
    assert(r.getLong(2) == recip / 2)
    assert(r.getDouble(3) == recip.toDouble / edges.size)
  }

  test("orders_order_gap: p50/p90 are exact ceil-rank stats of per-customer gaps") {
    val rows = SparkEntry.queries("orders_order_gap")(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toMap
    val ord = graft.sources.Tables.orders(spark, Sf)
      .join(graft.sources.Tables.customer(spark, Sf),
        org.apache.spark.sql.functions.expr("c_custkey = o_custkey"))
      .selectExpr("c_mktsegment as seg", "o_custkey as ck",
        "cast(o_orderdate as date) as d", "o_orderkey as ok")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDate(2).toLocalDate.toEpochDay, r.getLong(3)))
    val gaps = ord.groupBy(_._2).values.flatMap { xs =>
      val s0 = xs.sortBy(x => (x._3, x._4))
      s0.zip(s0.tail).map { case (a, b) => (a._1, b._3 - a._3) }
    }.toSeq
    for ((seg, gs0) <- gaps.groupBy(_._1)) {
      val gs = gs0.map(_._2).sorted
      val n = gs.length
      def cr(p: Int) = gs(((p * n + 99) / 100 - 1).toInt)
      val (gn, mean, p50, p90) = rows(seg)
      assert(gn == n.toLong)
      assert(math.abs(mean - gs.sum.toDouble / n) < 1e-9)
      assert(p50 == cr(50) && p90 == cr(90))
    }
  }
}
