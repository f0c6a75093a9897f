package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("packs by running total with deterministic order; huge docs span batches") {
    val df = Seq((1L, 5L), (2L, 5L), (3L, 12L), (4L, 3L)).toDF("id", "len")
    val out = Packing.packByTokenBudget(df, "id", "len", budget = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1)
    // order: len desc, id asc -> 3(12), 1(5), 2(5), 4(3); cum 12,17,22,25
    assert(out.toSeq == Seq((1L, 17L, 1L), (2L, 22L, 2L), (3L, 12L, 1L), (4L, 25L, 2L)))
  }

  test("empty input yields empty output; repeated actions agree (no stale state)") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "len")
    assert(Packing.packByTokenBudget(empty, "id", "len", 10L).count() == 0L)

    // the result must be stable across MULTIPLE actions on the same frame
    // (the failure mode of physical-partitioning-dependent prefix sums:
    // recomputation with different range sampling -> stale offsets)
    val df = (1L to 100L).map(i => (i, i % 7 + 1)).toDF("id", "len")
    val packed = Packing.packByTokenBudget(df, "id", "len", 16L)
    val a = packed.collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    val b = packed.collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq
    assert(a == b)
    // running total over (len desc, id) covers every token exactly once
    assert(a.map(_._2).max == df.agg(org.apache.spark.sql.functions.sum("len")).head().getLong(0))
  }
}
