package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave-10 lanes against driver-side references on sf0.001. */
class FilteredAnnRegevalSpec extends AnyFunSuite {
  import TestSpark._

  test("ann_filtered: exact filtered top-5, post-filter flags match a driver replay") {
    val got = SparkEntry.queries("ann_filtered")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.nonEmpty)
    val emb = graft.sources.Tables.embeddings(spark, Sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as e")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val queries = emb.filter(_._1 < 10)
    for ((qid, qv) <- queries) {
      val scored = emb.filter(e => e._1 != qid)
        .map(e => (e._1, cos(qv, e._2)))
      val pre = scored.filter(_._1 % 3 == 1)
        .sortBy(t => (-t._2, t._1)).take(5).map(_._1)
      val post = scored.sortBy(t => (-t._2, t._1)).take(15)
        .filter(_._1 % 3 == 1).take(5).map(_._1).toSet
      val mine = got.filter(_._1 == qid).sortBy(_._2)
      assert(mine.map(_._3).toSeq == pre.toSeq, s"q$qid pre top-5")
      for ((_, _, nid, found) <- mine)
        assert(found == post.contains(nid), s"q$qid n$nid flag")
    }
  }

  test("ml_regression_eval: closed-form SSE equals the residual sum; R2 identity") {
    val rows = SparkEntry.queries("ml_regression_eval")(spark, Sf).collect()
    assert(rows.length == 3)
    val li = graft.sources.Tables.lineitem(spark, Sf)
      .selectExpr("l_returnflag as f", "cast(l_quantity as double) as x",
        "cast(l_extendedprice as double) as y")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    for (r <- rows) {
      val f = r.getString(0)
      val (b, a) = (r.getDouble(2), r.getDouble(3))
      val g = li.filter(_._1 == f)
      val sse = g.map { case (_, x, y) => val d = y - (a + b * x); d * d }.sum
      val mean = g.map(_._3).sum / g.length
      val sst = g.map { case (_, _, y) => (y - mean) * (y - mean) }.sum
      assert(math.abs(r.getDouble(4) - sse) / sse < 1e-9, s"$f sse")
      assert(math.abs(r.getDouble(5) - sst) / sst < 1e-9, s"$f sst")
      assert(math.abs(r.getDouble(7) - (1.0 - sse / sst)) < 1e-9)
      assert(r.getDouble(6) == math.sqrt(r.getDouble(4) / r.getLong(1)))
    }
  }
}
