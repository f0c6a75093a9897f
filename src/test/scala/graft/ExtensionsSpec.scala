package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("graft kernels are callable from SQL via SparkSessionExtensions") {
    val cos = spark.sql(
      "SELECT graft_cosine(cast(array(1.0,2.0,3.0) as array<double>), " +
        "cast(array(1.0,2.0,3.0) as array<double>)) AS c").head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)

    val inter = spark.sql(
      "SELECT graft_sorted_intersect(cast(array(1,2,3) as array<bigint>), " +
        "cast(array(2,3,4) as array<bigint>)) AS n").head().getLong(0)
    assert(inter === 2L)

    val sh = spark.sql(
      "SELECT size(graft_shingle_hashes('a b c d e f', 5, 1)) AS n").head().getInt(0)
    assert(sh === 2)

    val mh = spark.sql(
      "SELECT size(graft_minhash(graft_shingle_hashes('a b c d e f', 5, 1), 32)) AS n")
      .head().getInt(0)
    assert(mh === 32)

    val simhashEq = spark.sql(
      "SELECT graft_simhash16(cast(array(7, 7, 8) as array<bigint>)) AS h").head().getLong(0)
    assert(simhashEq === 7L) // majority bits of {7,7,8} = 0b111

    // empty text -> no boundaries; short text -> one final boundary
    val cb = spark.sql("SELECT graft_chunk_bounds('abc', 8, 64) AS b").head().getSeq[Int](0)
    assert(cb == Seq(3))
  }

  test("r7 kernels: nfc, deflate, hll, bloom, count-min callable from SQL") {
    // decomposed e + U+0301 normalizes to composed é (single codepoint)
    val n = spark.sql("SELECT length(graft_nfc('caf' || 'é')) AS l").head().getInt(0)
    assert(n === 4)

    val dz = spark.sql("SELECT graft_deflate_size(repeat('ab', 500)) AS z").head().getLong(0)
    assert(dz > 0L && dz < 100L) // 1000 chars of repetition collapse

    val hll = spark.sql(
      "SELECT graft_hll_distinct(xxhash64(id), 12) AS d FROM range(1000)").head().getLong(0)
    assert(math.abs(hll - 1000L) <= 50L)

    val bloom = spark.sql(
      """WITH f AS (SELECT graft_bloom_build(xxhash64(id), 4096, 4) AS b FROM range(100))
        |SELECT graft_bloom_might_contain(f.b, xxhash64(42L)) AS hit,
        |       graft_bloom_might_contain(f.b, xxhash64(424242L)) AS miss FROM f""".stripMargin)
      .head()
    assert(bloom.getBoolean(0)) // inserted -> always true

    // bloom_merge: two shard filters OR-merged from SQL == one filter built
    // over the union (bit-identical serialized bytes, the lifecycle contract)
    val merged = spark.sql(
      """WITH shards AS (
        |  SELECT id % 2 AS shard, graft_bloom_build(xxhash64(id), 4096, 4) AS b
        |  FROM range(200) GROUP BY id % 2),
        |whole AS (SELECT graft_bloom_build(xxhash64(id), 4096, 4) AS b FROM range(200))
        |SELECT (SELECT graft_bloom_merge(b) FROM shards) = (SELECT first(b) FROM whole) AS eq
        |""".stripMargin).head().getBoolean(0)
    assert(merged)

    val cm = spark.sql(
      """WITH s AS (SELECT graft_count_min(CAST(id % 3 AS STRING), 4, 256) AS sk FROM range(300))
        |SELECT graft_count_min_estimate(s.sk, '0') AS est FROM s""".stripMargin)
      .head().getLong(0)
    assert(cm >= 100L && cm <= 120L)
  }

  test("r10 kernels: count-min inner product, gram, pq_adc callable from SQL") {
    // inner product of a sketch with itself = self-join size (>= n for n
    // distinct keys appearing once each; == n when collision-free)
    val inner = spark.sql(
      """WITH s AS (SELECT graft_count_min(CAST(id AS STRING), 4, 4096) AS sk FROM range(100))
        |SELECT graft_count_min_inner(s.sk, s.sk) AS j FROM s""".stripMargin)
      .head().getLong(0)
    assert(inner >= 100L && inner <= 110L)

    // gram over unit vectors along one axis: diagonal cell (0,0) = n*scale^2
    val g = spark.sql(
      """SELECT graft_gram(array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)), 2, 1024) AS g
        |FROM range(7)""".stripMargin).head().getSeq[Long](0)
    assert(g(0) === 7L * 1024 * 1024 && g(3) === 0L)

    // pq_adc: codes [1, 0] over a 2x2 table sum table[0*2+1] + table[1*2+0]
    val adc = spark.sql(
      """SELECT graft_pq_adc(array(1, 0),
        |  array(CAST(10.0 AS DOUBLE), CAST(20.0 AS DOUBLE),
        |        CAST(30.0 AS DOUBLE), CAST(40.0 AS DOUBLE)), 2) AS s""".stripMargin)
      .head().getDouble(0)
    assert(adc === 50.0)

    // count_min_merge: re-merged slice sketches estimate like the union
    val est = spark.sql(
      """WITH s AS (SELECT id % 3 AS slice,
        |    graft_count_min(CAST(id % 10 AS STRING), 4, 1024) AS sk
        |  FROM range(1000) GROUP BY id % 3),
        |m AS (SELECT graft_count_min_merge(sk) AS sk FROM s)
        |SELECT graft_count_min_estimate(m.sk, '3') FROM m""".stripMargin)
      .head().getLong(0)
    assert(est === 100L)
  }

  test("r11 kernels: exact bitmap build/merge/count/intersect callable from SQL") {
    // daily bitmaps union-merged == direct distinct count, exactly
    val n = spark.sql(
      """WITH d AS (SELECT id % 4 AS day, graft_bitmap(id % 100) AS bm
        |  FROM range(1000) GROUP BY id % 4),
        |m AS (SELECT graft_bitmap_merge(bm) AS bm FROM d)
        |SELECT graft_bitmap_count(m.bm) FROM m""".stripMargin).head().getLong(0)
    assert(n === 100L)

    // intersection of {0..59} and {40..99} = {40..59}
    val both = spark.sql(
      """SELECT graft_bitmap_and_count(
        |  (SELECT graft_bitmap(id) FROM range(60)),
        |  (SELECT graft_bitmap(id) FROM range(40, 100)))""".stripMargin)
      .head().getLong(0)
    assert(both === 20L)
  }

  test("r12 kernels: rank sample build/merge/quantile/count callable from SQL") {
    // k larger than the input: the sample is exhaustive, so quantiles are
    // exact — p50 of 0..999 at rank ceil(0.5*1000)=500 is value 499
    val r = spark.sql(
      """WITH d AS (SELECT id % 4 AS part, graft_rank_sample(id * 2654435761, id, 2000) AS sk
        |  FROM range(1000) GROUP BY id % 4),
        |m AS (SELECT graft_rank_sample_merge(sk, 2000) AS sk FROM d)
        |SELECT graft_rank_sample_quantile(sk, 50), graft_rank_sample_count(sk) FROM m"""
        .stripMargin).head()
    assert(r.getLong(0) === 499L)
    assert(r.getLong(1) === 1000L)
  }
}
