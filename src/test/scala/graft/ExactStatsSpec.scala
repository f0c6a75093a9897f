package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** events_autocorr and ml_split_gini pinned against independent
  * driver-side references computed from the same sf0.001 parquet with
  * BigInt / exact-integer arithmetic — a third implementation besides the
  * Spark query and the DuckDB oracle, so an arithmetic slip in the shared
  * formula (rather than in one engine) is also caught. */
class ExactStatsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val events: Seq[(String, Long, Long, Long)] = {
    // (event_type, ts_ns, user_id, cents)
    val df = Tables.events(spark, Sf)
    df.selectExpr("event_type", "ts_ns", "user_id",
        "cast(cast(value as decimal(12,2)) * 100 as bigint) as cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
  }

  test("events_autocorr matches a BigInt reference over the same parquet") {
    val daily = events.groupBy(e => (e._1, e._2 / 86400000000000L))
      .map { case ((t, d), xs) => (t, d, xs.size.toLong) }.toSeq
    val expected = daily.groupBy(_._1).flatMap { case (t, series0) =>
      val xs = series0.sortBy(_._2).map(_._3).map(BigInt(_))
      val n = BigInt(xs.size)
      val s = xs.sum
      val sxx = xs.map(x => x * x).sum
      val den = n * n * sxx - n * s * s
      (1 to 7).flatMap { k =>
        val pairs = xs.dropRight(k).zip(xs.drop(k))
        if (pairs.isEmpty) None
        else {
          val sxy = pairs.map { case (a, b) => a * b }.sum
          val hx = pairs.map(_._1).sum
          val tx = pairs.map(_._2).sum
          val m = BigInt(pairs.size)
          val num = n * n * sxy - n * s * (hx + tx) + m * s * s
          Some((t, k.toLong) -> (m.toLong, num.toDouble / den.toDouble))
        }
      }
    }
    val got = SparkEntry.queries("events_autocorr")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet === expected.keySet)
    for ((k, (m, acf)) <- expected) {
      assert(got(k)._1 == m, s"n_pairs at $k")
      // the lane's int64 arithmetic must agree with BigInt exactly, so the
      // doubles are bit-identical, not merely close
      assert(got(k)._2 == acf, s"acf at $k: got ${got(k)._2} want $acf")
    }
  }

  test("ml_split_gini matches a brute-force split scan over the same parquet") {
    val rows = events.map { case (t, ts, _, cents) =>
      val label = if (t == "purchase") 1L else 0L
      Seq(("cents", cents / 5000L, label),
        ("hour", (ts / 3600000000000L) % 24L, label),
        ("dow", ((ts / 86400000000000L) + 4L) % 7L, label))
    }.flatten
    val expected = rows.groupBy(_._1).flatMap { case (feat, fr) =>
      val total = fr.size.toLong
      val pos = fr.map(_._3).sum
      val buckets = fr.map(_._2).distinct.sorted
      buckets.flatMap { b =>
        // brute force: nothing cumulative — recount both sides per split
        val left = fr.filter(_._2 <= b)
        val nl = left.size.toLong
        if (nl == total) None
        else {
          val al = left.map(_._3).sum
          val nr = total - nl
          val ar = pos - al
          val g = (nl.toDouble -
            (al * al + (nl - al) * (nl - al)).toDouble / nl.toDouble +
            nr.toDouble -
            (ar * ar + (nr - ar) * (nr - ar)).toDouble / nr.toDouble) / total.toDouble
          Some((feat, b) -> (nl, al, nr, ar, g))
        }
      }
    }
    val got = SparkEntry.queries("ml_split_gini")(spark, Sf)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6), r.getBoolean(7))).toMap
    assert(got.keySet === expected.keySet)
    for ((k, (nl, al, nr, ar, g)) <- expected) {
      val (gnl, gal, gnr, gar, gg, _) = got(k)
      assert((gnl, gal, gnr, gar) == ((nl, al, nr, ar)), s"counts at $k")
      assert(gg == g, s"gini at $k: got $gg want $g")
    }
    // exactly one best split, and it is the (gini, feature, bucket) min
    val best = got.filter(_._2._6).keys.toSeq
    val want = got.toSeq.minBy { case ((f, b), v) => (v._5, f, b) }._1
    assert(best == Seq(want), s"is_best: got $best want $want")
  }
}
