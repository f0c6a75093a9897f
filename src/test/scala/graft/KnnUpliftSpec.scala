package graft

import org.scalatest.funsuite.AnyFunSuite

/** Wave-11 lanes against driver-side references on sf0.001. */
class KnnUpliftSpec extends AnyFunSuite {
  import TestSpark._

  test("ml_knn_classify: prediction is the majority label of the exact top-5") {
    val got = SparkEntry.queries("ml_knn_classify")(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val emb = graft.sources.Tables.embeddings(spark, Sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as e")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    for ((qid, qv) <- emb.filter(_._1 < 10)) {
      val top5 = emb.filter(_._1 != qid).map(e => (e._1, cos(qv, e._2)))
        .sortBy(t => (-t._2, t._1)).take(5).map(_._1 % 4)
      val (lbl, v) = top5.groupBy(identity).map { case (l, xs) => (l, xs.size) }
        .toSeq.sortBy(t => (-t._2, t._1)).head
      assert(got(qid) == ((lbl, v.toLong)), s"q$qid: ${got(qid)} vs ($lbl,$v)")
    }
  }

  test("events_uplift: rates and sign match raw conditional counts") {
    val rows = SparkEntry.queries("events_uplift")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.events(spark, Sf)
      .selectExpr("((ts_ns div 3600000000000) % 24) div 4 as seg",
        "user_id % 2 = 0 as t",
        "case when event_type = 'purchase' then 1L else 0L end as y")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    for (r <- rows) {
      val seg = r.getLong(0)
      val g = ev.filter(_._1 == seg)
      val nt = g.count(_._2).toLong; val ct = g.filter(_._2).map(_._3).sum
      val nc = g.count(!_._2).toLong; val cc = g.filterNot(_._2).map(_._3).sum
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((nt, ct, nc, cc)))
      assert(math.abs(r.getDouble(5) -
        (ct.toDouble / nt - cc.toDouble / nc)) < 1e-12)
      assert(r.getBoolean(6) == (ct * nc > cc * nt))
    }
  }
}
