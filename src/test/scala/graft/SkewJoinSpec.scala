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
}
