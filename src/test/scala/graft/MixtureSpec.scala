package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Mixture

class MixtureSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Driver-side replay of the 60-bit md5 coin — the cross-engine contract. */
  private def md5unit(s: String): Double = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16).toDouble / 1.152921504606846976e18
  }

  private val w = Map("s0" -> 1.0, "s1" -> 2.0, "s2" -> 3.0,
    "s3" -> 4.0, "s4" -> 1.0, "s5" -> 2.0)

  test("kept set equals the driver-side coin replay (exact membership, not just size)") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 900).map(i => (i.toLong, s"s${rnd.nextInt(6)}"))
    val df = rows.toDF("id", "source")
    val weights = w.toSeq.toDF("source", "w")
    val kept = Mixture.rebalance(df, "source", col("id").cast("string"), weights)
      .select("id").collect().map(_.getLong(0)).toSet
    val n = rows.groupBy(_._2).view.mapValues(_.size.toDouble).toMap
    val m = n.keys.map(s => n(s) / w(s)).min
    val rate = n.keys.map(s => s -> math.min(1.0, w(s) * m / n(s))).toMap
    val exp = rows.filter { case (id, s) => md5unit(id.toString) < rate(s) }.map(_._1).toSet
    assert(kept === exp)
    assert(kept.nonEmpty && kept.size < rows.size)
  }

  test("rates: shares normalize, every rate <= 1, binding source kept whole") {
    val rows = (1 to 600).map(i => (i.toLong, s"s${i % 6}"))
    val df = rows.toDF("id", "source")
    val r = Mixture.rates(df, "source", w.toSeq.toDF("source", "w"))
      .collect().map(x => x.getAs[String]("source") ->
        ((x.getAs[Long]("n_src"), x.getAs[Double]("share"), x.getAs[Double]("keep_rate")))).toMap
    assert(math.abs(r.values.map(_._2).sum - 1.0) < 1e-12)
    assert(r.values.forall(_._3 <= 1.0))
    // uniform 100-per-source counts: s3 (w=4) binds and keeps everything
    assert(r("s3")._3 >= 1.0 - 1e-12)
    // expected kept mass follows rate_s * n_s = w_s * M with M = 100/4
    assert(math.abs(r("s1")._3 * 100 - 2.0 * 25.0) < 1e-9)
  }
}
