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
}
