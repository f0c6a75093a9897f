package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.expressions.CountMin

class CountMinSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("hash pair matches the SQL derivation (pinned against DuckDB)") {
    // SELECT ('0x'||substr(md5(t),1,15))::BIGINT, ('0x'||substr(md5(t),17,15))::BIGINT*2+1
    assert(CountMin.hashPair("hello") === (419982666956583591L, 1670329351968848051L))
    assert(CountMin.hashPair("graft") === (466617675313949775L, 332474079975536199L))
  }

  test("one-sided error: est >= exact for every item") {
    val rnd = new scala.util.Random(11)
    // zipfian-ish: token i appears ~ 2000/i times
    val items = (1 to 200).flatMap(i => Seq.fill(math.max(1, 2000 / i))(s"tok_$i"))
    val df = rnd.shuffle(items).toDF("t")
    val sk = df.agg(CountMin.sketch(col("t"), 4, 1024).as("sk"))
    val exact = df.groupBy("t").agg(count(lit(1)).as("n"))
    val bad = exact.crossJoin(broadcast(sk))
      .where(CountMin.estimate(col("sk"), col("t")) < col("n"))
      .count()
    assert(bad === 0L)
  }

  test("overestimate bounded by ~eps*N on the heavy tail") {
    val items = (1 to 500).flatMap(i => Seq.fill(math.max(1, 1000 / i))(s"w$i"))
    val df = items.toDF("t")
    val n = items.size.toLong
    val width = 2048
    val sk = df.agg(CountMin.sketch(col("t"), 4, width).as("sk"))
    val worst = df.groupBy("t").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(sk))
      .select(max(CountMin.estimate(col("sk"), col("t")) - col("n")).as("d"))
      .head().getLong(0)
    // eps = e/width; generous 4x slack keeps the test deterministic-robust
    assert(worst <= math.max(4L, (4 * math.E * n / width).toLong), s"worst=$worst n=$n")
  }

  test("sketch bytes are partitioning-invariant (elementwise-add merge)") {
    val df = (1 to 3000).map(i => s"t_${i % 97}").toDF("t")
    val a = df.agg(CountMin.sketch(col("t"), 4, 256)).head().getAs[Array[Byte]](0)
    val b = df.repartition(13).agg(CountMin.sketch(col("t"), 4, 256))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("count_min_merge of per-slice sketches is bit-identical to the direct sketch") {
    // the stored-sketch lifecycle claim: daily tables OR any other split
    // re-merge to EXACTLY the union's sketch (elementwise add is
    // associative/commutative), so windows never rescan raw data
    val df = (1 to 4000).map(i => (i % 7, s"u_${i % 113}")).toDF("slice", "t")
    val direct = df.agg(CountMin.sketch(col("t"), 4, 256)).head().getAs[Array[Byte]](0)
    val remerged = df.groupBy("slice").agg(CountMin.sketch(col("t"), 4, 256).as("sk"))
      .agg(CountMin.merge(col("sk"))).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, remerged))
  }

  test("count_min_merge rejects shape-mismatched stored sketches") {
    val df = (1 to 100).map(i => s"t$i").toDF("t")
    val a = df.agg(CountMin.sketch(col("t"), 4, 256).as("sk"))
    val b = df.agg(CountMin.sketch(col("t"), 4, 512).as("sk"))
    val ex = intercept[Exception] {
      a.union(b).agg(CountMin.merge(col("sk"))).head()
    }
    assert(ex.getMessage.contains("cannot merge") ||
      ex.getCause != null && ex.getCause.getMessage.contains("cannot merge"))
  }

  test("inner product: exact join size when collision-free, one-sided when not") {
    val rnd = new scala.util.Random(7)
    val a = rnd.shuffle((1 to 60).flatMap(k => Seq.fill(1 + k % 5)(s"k$k"))).toDF("k")
    val b = rnd.shuffle((30 to 90).flatMap(k => Seq.fill(1 + k % 3)(s"k$k"))).toDF("k")
    val exact = a.join(b, "k").count()
    def est(width: Int): Long = {
      val sa = a.agg(CountMin.sketch(col("k"), 4, width).as("sa"))
      val sb = b.agg(CountMin.sketch(col("k"), 4, width).as("sb"))
      sa.crossJoin(sb).select(CountMin.innerProduct(col("sa"), col("sb")))
        .head().getLong(0)
    }
    // 90 distinct keys in 8192 cells: collision-free w.h.p. -> exact
    assert(est(8192) === exact)
    // 16 cells: heavy collisions -> strictly one-sided, never under
    assert(est(16) >= exact)
  }

  test("inner product rejects shape-mismatched sketches") {
    val df = Seq("x").toDF("k")
    val s1 = df.agg(CountMin.sketch(col("k"), 4, 256).as("a"))
    val s2 = df.agg(CountMin.sketch(col("k"), 4, 512).as("b"))
    val ex = intercept[Exception] {
      s1.crossJoin(s2).select(CountMin.innerProduct(col("a"), col("b"))).head()
    }
    assert(ex.getMessage.contains("shape mismatch") ||
      ex.getCause != null && ex.getCause.getMessage.contains("shape mismatch"))
  }

  test("unseen items can only report collision mass, never negative") {
    val df = (1 to 100).map(i => s"seen_$i").toDF("t")
    val sk = df.agg(CountMin.sketch(col("t"), 4, 4096).as("sk"))
    val est = Seq("never_seen").toDF("t").crossJoin(sk)
      .select(CountMin.estimate(col("sk"), col("t"))).head().getLong(0)
    assert(est >= 0L && est <= 100L)
  }
}
