package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.{Hll, HllBuffer}

class HllSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def estimate(n: Long, p: Int = 12, parts: Int = 1): Long =
    spark.range(n).repartition(parts)
      .agg(Hll.approxCountDistinct(col("id"), p).as("e"))
      .head().getLong(0)

  test("estimate lands inside ~5 standard errors across magnitudes") {
    // p=12: sigma ~= 1.04/sqrt(4096) ~= 1.63%; 5 sigma ~= 8%. The estimate
    // is deterministic, so these are pinned checks, not flaky ones.
    Seq(100L, 1000L, 10000L, 100000L).foreach { n =>
      val e = estimate(n)
      val err = math.abs(e.toDouble / n - 1.0)
      assert(err <= 0.08, s"n=$n est=$e err=$err")
    }
  }

  test("estimate is partitioning-invariant (register max is order-free)") {
    val one = estimate(50000L, parts = 1)
    val many = estimate(50000L, parts = 13)
    assert(one === many)
  }

  test("NULLs are excluded like count(DISTINCT x)") {
    // xxhash64(NULL) evaluates to the seed, so an unguarded hash would
    // count NULL as one extra distinct value
    val df = spark.range(100).select(
      when(col("id") % 4 === 0, lit(null).cast("long")).otherwise(col("id")).as("v"))
    val withNulls = df.agg(Hll.approxCountDistinct(col("v")).as("e")).head().getLong(0)
    val withoutNulls = df.where(col("v").isNotNull)
      .agg(Hll.approxCountDistinct(col("v")).as("e")).head().getLong(0)
    // same distinct set -> identical registers -> identical estimate
    // (linear counting rounds 75 -> 76; equality of the two paths is the
    // claim, not equality to the exact count)
    assert(withNulls === withoutNulls)
    val allNull = spark.range(10).select(lit(null).cast("long").as("v"))
      .agg(Hll.approxCountDistinct(col("v")).as("est")).head().getLong(0)
    assert(allNull === 0L)
  }

  test("duplicates do not move the estimate") {
    val dup = spark.range(10000).select((col("id") % 500).as("v"))
      .agg(Hll.approxCountDistinct(col("v")).as("e")).head().getLong(0)
    val uniq = spark.range(500).select(col("id").as("v"))
      .agg(Hll.approxCountDistinct(col("v")).as("e")).head().getLong(0)
    assert(dup === uniq)
  }

  test("buffer merge equals single-pass build (shuffle-combine correctness)") {
    def hash(i: Long): Long = graft.expressions.Sketch.splitmix64(i)
    val a = new HllBuffer(12)
    val b = new HllBuffer(12)
    val whole = new HllBuffer(12)
    (0L until 3000L).foreach { i => a.add(hash(i)); whole.add(hash(i)) }
    (2000L until 6000L).foreach { i => b.add(hash(i)); whole.add(hash(i)) }
    a.merge(b)
    assert(a.registers.toSeq === whole.registers.toSeq)
  }

  test("small-range linear counting keeps tiny cardinalities near-exact") {
    Seq(1L, 5L, 20L).foreach { n =>
      val e = estimate(n)
      assert(math.abs(e - n) <= 1, s"n=$n est=$e")
    }
  }

  test("sketch-table lifecycle: merged partials are byte-identical to the direct sketch") {
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.expressions.Hll
    val df = (1 to 5000).map(i => (i % 7, s"u${i % 911}")).toDF("g", "u")
    // daily-style partials on an extra key, merged back up
    val partial = df.withColumn("d", col("u").substr(2, 1))
      .groupBy("g", "d").agg(Hll.sketch(col("u"), 10).as("sk"))
      .groupBy("g").agg(Hll.merge(col("sk")).as("sk"))
    val direct = df.groupBy("g").agg(Hll.sketch(col("u"), 10).as("sk2"))
    val joined = partial.join(direct, "g")
      .select(col("sk") === col("sk2")).collect()
    assert(joined.nonEmpty && joined.forall(_.getBoolean(0)))
    // and the estimate read off the merged sketch equals the one-shot estimate
    val est = partial.select(Hll.estimate(col("sk")).as("e")).orderBy("e")
      .collect().map(_.getLong(0)).toSeq
    val estDirect = df.groupBy("g").agg(Hll.approxCountDistinct(col("u"), 10).as("e"))
      .select("e").orderBy("e").collect().map(_.getLong(0)).toSeq
    assert(est === estDirect)
  }

  test("merging an empty group yields the canonical empty sketch (estimate 0)") {
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.expressions.Hll
    val empty = Seq.empty[Array[Byte]].toDF("sk")
    val e = empty.agg(Hll.estimate(Hll.merge(col("sk"))).as("e")).head().getLong(0)
    assert(e === 0L)
  }
}
