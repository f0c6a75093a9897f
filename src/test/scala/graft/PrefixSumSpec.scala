package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PrefixSum

class PrefixSumSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("matches the sequential model on sparse random ordinals") {
    val rnd = new scala.util.Random(13)
    // sparse, non-contiguous ordinals across many buckets
    val rows = rnd.shuffle((0 until 500).map(_ => rnd.nextInt(100000))
      .distinct.map(o => (o.toLong, (rnd.nextInt(50) + 1).toLong)))
    val expected = rows.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, acc), (o, v)) => (o, v, acc + v) }
      .drop(1)
    val got = PrefixSum.inclusive(rows.toDF("ord", "v"), "ord", "v", 64L)
      .orderBy("ord")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("invariant under repartition") {
    val rows = (0L until 300L).map(o => (o * 3, o % 7 + 1))
    val a = PrefixSum.inclusive(rows.toDF("ord", "v"), "ord", "v", 32L)
      .orderBy("ord").collect().map(_.getLong(2)).toSeq
    val b = PrefixSum.inclusive(rows.toDF("ord", "v").repartition(17),
        "ord", "v", 32L)
      .orderBy("ord").collect().map(_.getLong(2)).toSeq
    assert(a === b)
  }
}
