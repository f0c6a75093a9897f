package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DecisionTree

/** Level-wise Gini tree pinned against a driver-side reference that grows
  * the same heap-indexed tree imperatively: identical impurity operation
  * order, identical (gini, feature, bucket) argmin, identical freezing
  * rule — on shapes that exercise early leaves (pure nodes, single-bucket
  * nodes) and deep splits. */
class DecisionTreeSpec extends AnyFunSuite {
  import TestSpark._

  private case class Split(node: Long, feature: String, bucket: Long,
      gini: Double, n: Long, nPos: Long)

  /** rows: (featureName -> bucket, label). */
  private def reference(rows: Seq[(Map[String, Long], Long)],
      features: Seq[String], depth: Int)
      : (Seq[Split], Map[Long, (Long, Long)]) = {
    var assign: Seq[(Map[String, Long], Long, Long)] =
      rows.map { case (f, y) => (f, y, 1L) }
    val splits = scala.collection.mutable.ArrayBuffer.empty[Split]
    for (level <- 0 until depth) {
      val lo = 1L << level
      val nodes = assign.map(_._3).filter(_ >= lo).distinct.sorted
      val chosen = nodes.flatMap { nd =>
        val sub = assign.filter(_._3 == nd)
        val cands = for {
          f <- features
          buckets = sub.map(_._1(f)).distinct.sorted
          b <- buckets.dropRight(1) // nl < n: last bucket has empty right
        } yield {
          val left = sub.filter(_._1(f) <= b)
          val nl = left.size.toLong
          val al = left.map(_._2).sum
          val n = sub.size.toLong
          val a = sub.map(_._2).sum
          val nr = n - nl; val ar = a - al
          val g = (nl.toDouble
            - (al * al + (nl - al) * (nl - al)).toDouble / nl.toDouble
            + nr.toDouble
            - (ar * ar + (nr - ar) * (nr - ar)).toDouble / nr.toDouble) / n.toDouble
          (g, f, b, n, a)
        }
        if (cands.isEmpty) None
        else {
          val (g, f, b, n, a) = cands.minBy { case (g, f, b, _, _) => (g, f, b) }
          Some(Split(nd, f, b, g, n, a))
        }
      }
      splits ++= chosen
      val byNode = chosen.map(s => s.node -> s).toMap
      assign = assign.map { case (f, y, nd) =>
        byNode.get(nd) match {
          case Some(s) => (f, y, 2 * nd + (if (f(s.feature) <= s.bucket) 0L else 1L))
          case None => (f, y, nd)
        }
      }
    }
    val leaves = assign.groupBy(_._3).map { case (nd, xs) =>
      nd -> (xs.size.toLong, xs.map(_._2).sum)
    }
    (splits.toSeq, leaves)
  }

  private def run(rows: Seq[(Map[String, Long], Long)],
      features: Seq[String], depth: Int)
      : (Seq[Split], Map[Long, (Long, Long)]) = {
    import TestSpark.spark.implicits._
    val df = rows.map { case (f, y) =>
      (features.map(f): @unchecked) match {
        case Seq(a, b, c) => (a, b, c, y)
      }
    }.toDF(features :+ "label": _*)
    val (splits, assigned) = DecisionTree.fit(df, features, "label", depth)
    val gotSplits = splits.collect().map(r => Split(r.getLong(0), r.getString(1),
      r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5))).toSeq
    val gotLeaves = assigned.groupBy("node").count()
      .collect().map(r => r.getLong(0)).toSet
    val census = assigned.collect().map(r => r.getAs[Long]("node") ->
      r.getAs[Long]("label")).groupBy(_._1).map { case (nd, xs) =>
      nd -> (xs.length.toLong, xs.map(_._2).sum)
    }
    assert(gotLeaves === census.keySet)
    (gotSplits, census)
  }

  test("matches the imperative reference on random bucketed data") {
    val feats = Seq("f1", "f2", "f3")
    for (seed <- Seq(7, 19, 43)) {
      val rnd = new scala.util.Random(seed)
      val rows = Seq.fill(200) {
        (feats.map(f => f -> rnd.nextInt(6).toLong).toMap,
          if (rnd.nextInt(3) == 0) 1L else 0L)
      }
      for (depth <- Seq(1, 2, 3)) {
        val (gotS, gotL) = run(rows, feats, depth)
        val (expS, expL) = reference(rows, feats, depth)
        assert(gotS.sortBy(_.node) === expS.sortBy(_.node), s"splits seed=$seed depth=$depth")
        assert(gotL === expL, s"leaves seed=$seed depth=$depth")
      }
    }
  }

  test("fitBagged on T trees equals fit run per bag subset") {
    import TestSpark.spark.implicits._
    val feats = Seq("f1", "f2", "f3")
    val rnd = new scala.util.Random(83)
    val rows = Seq.fill(240)((rnd.nextInt(6).toLong, rnd.nextInt(6).toLong,
      rnd.nextInt(6).toLong, if (rnd.nextInt(3) == 0) 1L else 0L))
    // deterministic bags: row i in tree t iff (i*7 + t) % 3 != 0
    val bags = (0L until 3L).flatMap { t =>
      rows.zipWithIndex.collect { case ((a, b, c, y), i) if (i * 7 + t) % 3 != 0 =>
        (t, a, b, c, y)
      }
    }
    val baggedDf = bags.toDF("tree" +: feats :+ "label": _*)
    val (fSplits, fAssigned) = DecisionTree.fitBagged(baggedDf, feats, "label", 2)
    val forestSplits = fSplits.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getString(2), r.getLong(3), r.getDouble(4), r.getLong(5), r.getLong(6))).toMap
    val forestLeaves = fAssigned.groupBy("tree", "node")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (t <- 0L until 3L) {
      val sub = bags.filter(_._1 == t).map { case (_, a, b, c, y) => (a, b, c, y) }
      val subDf = sub.toDF(feats :+ "label": _*)
      val (sSplits, sAssigned) = DecisionTree.fit(subDf, feats, "label", 2)
      val single = sSplits.collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5))).toMap
      assert(single === forestSplits.collect { case ((`t`, nd), v) => nd -> v },
        s"tree $t splits")
      val singleLeaves = sAssigned.groupBy("node")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(singleLeaves === forestLeaves.collect { case ((`t`, nd), v) => nd -> v },
        s"tree $t leaves")
    }
  }

  test("pure and single-bucket nodes freeze instead of re-splitting") {
    val feats = Seq("f1", "f2", "f3")
    // f1 separates perfectly at bucket 0; all other features constant —
    // children are pure AND single-bucket, so depth-3 must stop at depth 1
    val rows = (0 until 40).map { i =>
      (Map("f1" -> (i % 2).toLong, "f2" -> 1L, "f3" -> 2L), (i % 2).toLong)
    }
    val (gotS, gotL) = run(rows, feats, 3)
    val (expS, expL) = reference(rows, feats, 3)
    assert(gotS.sortBy(_.node) === expS.sortBy(_.node))
    assert(gotL === expL)
    assert(gotS.map(_.node) === Seq(1L), "only the root splits")
    assert(gotL.keySet === Set(2L, 3L), "children froze at level 1 ids")
  }
}
