package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.Bloom
import graft.operators.IncrementalDedup

class BloomSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("no false negatives: every inserted value tests positive") {
    val vals = (1 to 2000).map(i => s"key_$i")
    val df = vals.toDF("k")
    val filter = df.agg(Bloom.aggregate(col("k"), 1 << 16, 6).as("b"))
    val missed = df.crossJoin(filter)
      .where(!Bloom.mightContain(col("b"), col("k")))
      .count()
    assert(missed === 0L)
  }

  test("false-positive rate is near the analytic (1 - e^{-kn/m})^k") {
    val n = 2000
    val corpus = (1 to n).map(i => s"in_$i").toDF("k")
    val probes = (1 to 4000).map(i => s"out_$i").toDF("k")
    val m = 1 << 15
    val k = 6
    val fp = IncrementalDedup.maybeFraction(probes, corpus, "k", m, k)
    val analytic = math.pow(1 - math.exp(-k.toDouble * n / m), k)
    assert(fp <= analytic * 3 + 0.01, s"fp=$fp analytic=$analytic")
  }

  test("filter bytes are partitioning-invariant (OR-merge)") {
    val df = (1 to 500).map(i => s"v_$i").toDF("k")
    val a = df.agg(Bloom.aggregate(col("k"), 1 << 12, 4)).head().getAs[Array[Byte]](0)
    val b = df.repartition(7).agg(Bloom.aggregate(col("k"), 1 << 12, 4))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("nulls are skipped, not inserted") {
    val df = Seq(Some("x"), None, None).toDF("k")
    val empty = Seq.empty[Option[String]].toDF("k")
    val withNulls = df.where(col("k").isNull)
      .agg(Bloom.aggregate(col("k"), 1 << 10, 4)).head().getAs[Array[Byte]](0)
    val fromEmpty = empty.agg(Bloom.aggregate(col("k"), 1 << 10, 4))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(withNulls, fromEmpty))
  }

  test("incremental dedup equals the plain anti-join, including FP resolution") {
    // tiny filter (256 bits) over 300 corpus keys -> saturated filter,
    // many false positives; the exact resolve must still produce the
    // anti-join's rows exactly
    val corpus = (1 to 300).map(i => s"c_$i").toDF("fp")
    val incoming = ((1 to 50).map(i => (i.toLong, s"c_$i")) ++
      (51 to 120).map(i => (i.toLong, s"new_$i"))).toDF("id", "fp")
    val got = IncrementalDedup.newRows(incoming, corpus, "fp", numBits = 256, numHashes = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = incoming.join(corpus, Seq("fp"), "left_anti")
      .select("id", "fp").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === want)
    assert(got.length === 70)
  }

  test("sharded incremental dedup equals the plain anti-join and the flat path") {
    val corpus = (1 to 300).map(i => s"c_$i").toDF("fp")
    val incoming = ((1 to 50).map(i => (i.toLong, s"c_$i")) ++
      (51 to 120).map(i => (i.toLong, s"new_$i"))).toDF("id", "fp")
    // small shards (512 bits) over 8 buckets -> saturated per-bucket
    // filters, real false positives; exact resolve must still match
    val got = IncrementalDedup.newRowsSharded(incoming, corpus, "fp",
      numShards = 8, bitsPerShard = 512, numHashes = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = incoming.join(corpus, Seq("fp"), "left_anti")
      .select("id", "fp").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === want)
    val flat = IncrementalDedup.newRows(incoming, corpus, "fp",
      numBits = 4096, numHashes = 3)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === flat)
  }

  test("per-bucket filter size is a constant of the config, independent of corpus count") {
    // the 100 TB claim in one assertion: 100 keys or 10,000 keys, every
    // shard's serialized filter is exactly 1 + bitsPerShard/8 bytes —
    // corpus growth adds SHARDS, never bytes-per-shard
    val bitsPerShard = 1 << 12
    for (n <- Seq(100, 10000)) {
      val corpus = (1 to n).map(i => s"key_$i").toDF("fp")
      val sizes = IncrementalDedup.shardedFilters(corpus, "fp",
        numShards = 16, bitsPerShard = bitsPerShard, numHashes = 6)
        .select(octet_length(col("__bloom")).as("len"))
        .agg(min("len"), max("len"), count(lit(1))).head()
      assert(sizes.getInt(0) === 1 + bitsPerShard / 8, s"n=$n min size")
      assert(sizes.getInt(1) === 1 + bitsPerShard / 8, s"n=$n max size")
      assert(sizes.getLong(2) === 16L, s"n=$n all shards populated")
    }
  }

  test("incremental maintenance: OR-merged filter tables are bit-identical to a rebuild") {
    // the stored-sketch lifecycle claim made literal: filters(A) merged
    // with filters(B) must equal filters(A union B) byte for byte, per
    // bucket — so daily deltas maintain the table with no corpus rescan
    val a = (1 to 400).map(i => s"old_$i").toDF("fp")
    val b = (1 to 150).map(i => s"new_$i").toDF("fp")
    def filters(df: org.apache.spark.sql.DataFrame) =
      IncrementalDedup.shardedFilters(df, "fp", numShards = 8, bitsPerShard = 1 << 10, numHashes = 4)
    val merged = IncrementalDedup.mergeShardedFilters(filters(a), filters(b))
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    val rebuilt = filters(a.unionByName(b))
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(merged.keySet === rebuilt.keySet)
    for ((k, bytes) <- rebuilt)
      assert(java.util.Arrays.equals(merged(k), bytes), s"bucket $k diverged")
  }

  test("merging filters of different geometry fails loudly") {
    val a = (1 to 50).map(i => s"x_$i").toDF("fp")
    val fa = IncrementalDedup.shardedFilters(a, "fp", 4, 1 << 10, 4)
    val fb = IncrementalDedup.shardedFilters(a, "fp", 4, 1 << 12, 4)
    val ex = intercept[Exception] {
      IncrementalDedup.mergeShardedFilters(fa, fb).collect()
    }
    assert(ex.getMessage.contains("geometry") || ex.getCause != null)
  }

  test("sharded dedup matches the plain anti-join over 12 random datasets") {
    // randomized overlap fractions, shard counts, and saturation levels —
    // the no-false-negative contract must hold at every configuration
    val rnd = new scala.util.Random(8205L)
    (1 to 12).foreach { trial =>
      val nCorpus = 20 + rnd.nextInt(300)
      val corpus = (1 to nCorpus).map(i => s"t${trial}_c$i").toDF("fp")
      val incoming = (1 to 20 + rnd.nextInt(150)).map { i =>
        val dup = rnd.nextInt(100) < 30
        (i.toLong, if (dup) s"t${trial}_c${1 + rnd.nextInt(nCorpus)}" else s"t${trial}_n$i")
      }.toDF("id", "fp")
      val shards = 1 << rnd.nextInt(5)             // 1..16
      val bits = 8 << (3 + rnd.nextInt(5))         // 64..1024 bits: often saturated
      val got = IncrementalDedup.newRowsSharded(incoming, corpus, "fp",
        shards, bits, numHashes = 1 + rnd.nextInt(5))
        .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val want = incoming.join(corpus, Seq("fp"), "left_anti")
        .select("id", "fp").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got === want, s"trial=$trial shards=$shards bits=$bits")
    }
  }

  test("sharded probe: buckets absent from the corpus are definitely-new") {
    // force disjoint buckets: corpus keys land in some buckets, incoming
    // keys that hash to EMPTY buckets must survive with no exact-resolve
    val corpus = (1 to 20).map(i => s"c_$i").toDF("fp")
    val incoming = (1 to 200).map(i => (i.toLong, s"probe_$i")).toDF("id", "fp")
    val got = IncrementalDedup.newRowsSharded(incoming, corpus, "fp",
      numShards = 64, bitsPerShard = 512, numHashes = 3).count()
    assert(got === 200L)
  }
}
