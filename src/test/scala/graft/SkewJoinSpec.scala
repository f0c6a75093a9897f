package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("salted join returns exactly the plain-join result on a skewed key") {
    // 90% of fact rows share one hot key
    val fact = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i.toLong))
      .toDF("k", "payload")
    val dim = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"),
      (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "name")

    val plain = fact.join(dim, "k").select("k", "payload", "name")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val salted = SkewJoin.saltedInnerJoin(fact, dim, "k", 8)
      .select("k", "payload", "name")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted === plain)
    assert(salted.size === 10000)
  }

  test("hybrid join equals the plain join and routes exactly the hot keys") {
    // one key owns 90% of the rows; seven cold keys share the rest
    val fact = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i.toLong))
      .toDF("k", "payload")
    val dim = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"),
      (4L, "e"), (5L, "f"), (6L, "g")).toDF("k", "name")

    val plain = fact.join(dim, "k").select("k", "payload", "name")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val hj = SkewJoin.hybridInnerJoin(fact, dim, "k", hotMultiple = 4L)
    val hybrid = hj.result.select("k", "payload", "name")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(hybrid === plain)
    // relative threshold: 8 keys, mean share 1/8; only key 42 (90%) exceeds
    // 4x the mean — the census must find it and nothing else
    assert(hj.hotKeys.as[Long].collect().toSeq === Seq(42L))
  }

  test("hybrid join with no qualifying hot key degrades to the plain join") {
    val fact = (1 to 1000).map(i => (i.toLong % 8, i.toLong)).toDF("k", "payload")
    val dim = (0L to 7L).map(k => (k, s"n$k")).toDF("k", "name")
    val plain = fact.join(dim, "k").select("k", "payload", "name")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val hj = SkewJoin.hybridInnerJoin(fact, dim, "k", hotMultiple = 4L)
    assert(hj.hotKeys.count() === 0L)
    val hybrid = hj.result.select("k", "payload", "name")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(hybrid === plain)
  }
}
