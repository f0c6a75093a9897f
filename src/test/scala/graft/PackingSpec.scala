package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("packs by running total with deterministic order; huge docs span batches") {
    val df = Seq((1L, 5L), (2L, 5L), (3L, 12L), (4L, 3L)).toDF("id", "len")
    val out = Packing.packByTokenBudget(df, "id", "len", budget = 10L, numPartitions = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    // order: len desc, id asc -> 3(12), 1(5), 2(5), 4(3); cum 12,17,22,25
    assert(out.toSeq == Seq((1L, 17L, 1L), (2L, 22L, 2L), (3L, 12L, 1L), (4L, 25L, 2L)))
  }

  test("empty input yields empty output; result is partition-count invariant") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "len")
    assert(Packing.packByTokenBudget(empty, "id", "len", 10L).count() == 0L)

    val df = (1L to 100L).map(i => (i, i % 7 + 1)).toDF("id", "len")
    val a = Packing.packByTokenBudget(df, "id", "len", 16L, numPartitions = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    val b = Packing.packByTokenBudget(df, "id", "len", 16L, numPartitions = 13)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
