package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Dedicated references for the r14 lanes that previously leaned only on
  * the oracle gate: AP/calibration unit anchors with hand-computed
  * answers, Pareto class cuts, balanced-sampling membership invariants,
  * RA link-prediction scores, zonemap pruning counts, and the
  * t-closeness EMD — each against an independent driver computation on
  * sf0.001 (or a hand-built frame). */
class FifthWaveSpec extends AnyFunSuite {
  import TestSpark._

  test("Auc.averagePrecision on a hand-computed 2-level domain") {
    import spark.implicits._
    // scores: level 1 = (2 pos, 1 neg), level 0 = (1 pos, 2 neg); walking
    // cuts descending: cut=1: tp=2, flagged=3 -> (2/3)*(2/3); cut=0:
    // dtp=1, tp=3, flagged=6 -> (1/3)*(3/6). AP = 4/9 + 1/6 = 11/18.
    val df = Seq((1L, 1L), (1L, 1L), (1L, 0L), (0L, 1L), (0L, 0L), (0L, 0L))
      .toDF("s", "label")
    val r = graft.operators.Auc.averagePrecision(df, "s", "label", Seq(0L, 1L))
      .collect().head
    assert(r.getLong(0) == 3 && r.getLong(1) == 3)
    assert(math.abs(r.getDouble(3) - 11.0 / 18.0) < 1e-15)
  }

  test("Auc.calibrationTable on the same frame: implied vs empirical and Brier") {
    import spark.implicits._
    val df = Seq((1L, 1L), (1L, 1L), (1L, 0L), (0L, 1L), (0L, 0L), (0L, 0L))
      .toDF("s", "label")
    val rows = graft.operators.Auc.calibrationTable(df, "s", "label", Seq(0L, 1L))
      .collect().sortBy(_.getLong(0))
    // level 0: n=3, pos=1, pred=0, emp=1/3; level 1: n=3, pos=2, pred=1, emp=2/3
    assert(rows(0).getLong(1) == 3 && rows(0).getLong(2) == 1)
    assert(rows(0).getDouble(3) == 0.0)
    assert(math.abs(rows(0).getDouble(4) - 1.0 / 3.0) < 1e-15)
    assert(rows(1).getDouble(3) == 1.0)
    // Brier = [1*(1-0)^2 + 2*0^2 + 2*(1-1)^2 + 1*1^2]/6 = 2/6
    assert(math.abs(rows(0).getDouble(6) - 2.0 / 6.0) < 1e-15)
  }

  test("orders_pareto class cuts match a driver-side cumulative walk") {
    val got = SparkEntry.queries("orders_pareto")(spark, Sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // (pk, rev_units) exactly as the lane defines them:
    // extendedprice * (1 - discount) at scale 4
    val li = graft.sources.Tables.lineitem(spark, Sf)
      .selectExpr("l_partkey as pk",
        "cast(cast(l_extendedprice as decimal(12,2)) * (1 - cast(l_discount as decimal(4,2))) * 10000 as bigint) as u")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val perPart = li.groupBy(_._1).map { case (pk, xs) => (pk, xs.map(_._2).sum) }
      .toSeq.sortBy(t => (-t._2, t._1))
    val total = perPart.map(_._2).sum
    var cum = 0L
    val classed = perPart.map { case (pk, r) =>
      cum += r
      val c = if (cum * 5 <= total * 4) "A" else if (cum * 20 <= total * 19) "B" else "C"
      (c, pk, r)
    }
    val wantByClass = classed.groupBy(_._1)
      .map { case (c, xs) => c -> (xs.size.toLong, xs.map(_._3).sum) }
    assert(got == wantByClass, s"$got vs $wantByClass")
  }

  test("sample_balanced: every class kept at exactly the minority count") {
    val got = SparkEntry.queries("sample_balanced")(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = graft.sources.Tables.events(spark, Sf)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = counts.values.min
    assert(got.keySet == counts.keySet)
    for ((t, k) <- got) assert(k == target, s"$t kept $k != minority $target")
  }

  private def got20(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("graph_linkpred_ra: RA scores equal the fixed-point 1/deg witness sum") {
    val rows = SparkEntry.queries("graph_linkpred_ra")(spark, Sf).collect()
    assert(rows.length == 20)
    // rebuild the symmetrized adjacency exactly as graph_linkpred does
    val cust = graft.sources.Tables.customer(spark, Sf)
      .select(col("c_custkey").cast("long").as("node"))
    val n = cust.count()
    import graft.functions.{TextFunctions => Tf}
    val dir0 = cust.where(col("node") % 7 =!= 0)
      .select(col("node").as("src"), explode(array(
        pmod(Tf.hash60(concat(lit("scc-a-"), col("node").cast("string"))), lit(n)),
        pmod(Tf.hash60(concat(lit("scc-b-"), col("node").cast("string"))), lit(n))))
        .as("dst"))
      .where(col("src") =!= col("dst"))
      .join(cust.select(col("node").as("dst")), Seq("dst"), "left_semi")
      .collect().map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val und = (dir0 ++ dir0.map(e => (e._2, e._1))).distinct
    val adj = und.groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).toSet }
    // reference scores for ALL candidate pairs, ranked (ra desc, u, v)
    val scores = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    for ((w, nbrs) <- adj; u <- nbrs; v <- nbrs if u < v) {
      val wt = (1L << 20) / adj(w).size
      val (c0, r0) = scores.getOrElse((u, v), (0L, 0L))
      scores((u, v)) = (c0 + 1, r0 + wt)
    }
    val want = scores.toSeq.map { case ((u, v), (c, ra)) => (u, v, c, ra) }
      .sortBy(t => (-t._4, t._1, t._2)).take(20)
    assert(got20(rows) == want)
    for (r <- rows)
      assert(r.getBoolean(4) ==
        adj.get(r.getLong(0)).exists(_.contains(r.getLong(1))))
  }

  test("layout_zonemap: pruning is lossless and counts reconcile") {
    val rows = SparkEntry.queries("layout_zonemap")(spark, Sf).collect()
    assert(rows.length == 4)
    for (r <- rows) {
      val (nf, ns) = (r.getLong(1), r.getLong(2))
      assert(ns <= nf)
      // the soundness contract: a pruned file never contains a match
      assert(r.getLong(5) == 0L, s"pid ${r.getLong(0)}: matches in pruned files")
      // every match was inside a scanned file
      assert(r.getLong(4) <= r.getLong(3))
    }
    // predicate 1 (one-year band on insert-ordered dates) must actually
    // prune something, or the lane is vacuous
    val p1 = rows.find(_.getLong(0) == 1L).get
    assert(p1.getLong(2) < p1.getLong(1))
  }

  test("audit_tcloseness EMD equals a driver-side cumulative-difference walk") {
    val rows = SparkEntry.queries("audit_tcloseness")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val cust = graft.sources.Tables.customer(spark, Sf)
      .selectExpr("cast(c_nationkey as long) as nk", "c_mktsegment",
        "cast(floor(c_acctbal / 2000) as long) as b")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val domain = cust.map(_._3).distinct.sorted
    val nn = cust.length.toLong
    val m = domain.length.toLong
    val globCum = domain.map(b => b -> cust.count(_._3 <= b).toLong).toMap
    for (r <- rows.take(20)) {
      val (nk, seg, cn) =
        (r.getAs[Number](0).longValue, r.getString(1), r.getLong(2))
      val cls = cust.filter(c => c._1 == nk && c._2 == seg)
      assert(cn == cls.length.toLong)
      val num = domain.map { b =>
        val cc = cls.count(_._3 <= b).toLong
        math.abs(cc * nn - globCum(b) * cn)
      }.sum
      assert(r.getLong(3) == num, s"($nk,$seg) emd_num")
      assert(r.getLong(4) == cn * nn * (m - 1))
      assert(r.getBoolean(6) == (num * 5 > cn * nn * (m - 1)))
    }
  }
}
