package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Driver-model pins for the r13 wave-3 lanes: the AMS tug-of-war
  * identity (counter_j = Σ_u cnt_u·sign_j(u), so est_j = c_j² and the
  * daily→merged sum is bit-identical to the direct build), and the exact
  * Kneser-Ney rational on a hand-computed corpus. */
class AmsKneserNeySpec extends AnyFunSuite {
  import TestSpark._

  test("AMS counters: linear merge equals direct build and matches the sign model") {
    import TestSpark.spark.implicits._
    val rnd = new scala.util.Random(59)
    val rows = Seq.fill(300)((rnd.nextInt(3), rnd.nextInt(40).toLong, rnd.nextInt(5).toLong))
    val df = rows.toDF("grp", "uid", "day")
      .withColumn("h", graft.functions.TextFunctions.hash60(
        concat(lit("ams-"), col("uid").cast("string"))))
    val signed = (0 until 9).foldLeft(df) { (d, j) =>
      d.withColumn(s"s$j", lit(1L) - lit(2L) * pmod(expr(s"h div ${1L << j}"), lit(2L)))
    }
    val dailyCols = (0 until 9).map(j => sum(col(s"s$j")).as(s"c$j"))
    val daily = signed.groupBy("grp", "day").agg(dailyCols.head, dailyCols.tail: _*)
    val mergedCols = (0 until 9).map(j => sum(col(s"c$j")).as(s"m$j"))
    val merged = daily.groupBy("grp").agg(mergedCols.head, mergedCols.tail: _*)
      .collect().map(r => r.getInt(0) -> (1 to 9).map(r.getLong).toSeq).toMap
    val directCols = (0 until 9).map(j => sum(col(s"s$j")).as(s"d$j"))
    val direct = signed.groupBy("grp").agg(directCols.head, directCols.tail: _*)
      .collect().map(r => r.getInt(0) -> (1 to 9).map(r.getLong).toSeq).toMap
    assert(merged === direct, "linearity: daily-sum == direct")
    // driver model: recompute counters from the collected hash values
    val hs = df.select("grp", "h").collect().map(r => (r.getInt(0), r.getLong(1)))
    val model = hs.groupBy(_._1).map { case (g, xs) =>
      g -> (0 until 9).map(j => xs.map { case (_, h) =>
        1L - 2L * ((h >> j) & 1L) }.sum).toSeq
    }
    assert(direct === model, "counters match the bit-extraction model")
  }

  test("Kneser-Ney rational on a hand-computed corpus") {
    import TestSpark.spark.implicits._
    // corpus: "a b", "a b", "a c", "b c" → bigrams: (a,b)x2 (a,c) (b,c)
    // c_x: a=3, b=1; N1+(a·)=2, N1+(b·)=1; N1+(·b)=1, N1+(·c)=2; N=3
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "b c"))
      .toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val wl = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("pos")
    val pairs = toks.withColumn("y", lead("w", 1).over(wl))
      .where(col("y").isNotNull && col("w") =!= "" && col("y") =!= "")
      .select(col("w").as("x"), col("y"))
    val c12 = pairs.groupBy("x", "y").agg(count(lit(1)).as("c_xy"))
    val c1 = pairs.groupBy("x").agg(count(lit(1)).as("c_x"))
    val n1l = c12.groupBy("x").agg(count(lit(1)).as("n1_x"))
    val n1r = c12.groupBy("y").agg(count(lit(1)).as("n1_y"))
    val ntot = c12.agg(count(lit(1)).as("n_types"))
    val out = c12.join(c1, "x").join(n1l, "x").join(n1r, "y")
      .crossJoin(broadcast(ntot))
      .withColumn("p_num",
        greatest(lit(4L) * col("c_xy") - lit(3L), lit(0L)) * col("n_types")
          + lit(3L) * col("n1_x") * col("n1_y"))
      .withColumn("p_den", lit(4L) * col("c_x") * col("n_types"))
      .select("x", "y", "p_num", "p_den")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // P(b|a): max(4·2−3,0)·3 + 3·2·1 = 15+6 = 21 over 4·3·3 = 36
    assert(out(("a", "b")) === (21L, 36L))
    // P(c|a): max(4·1−3,0)·3 + 3·2·2 = 3+12 = 15 over 36
    assert(out(("a", "c")) === (15L, 36L))
    // P(c|b): max(4·1−3,0)·3 + 3·1·2 = 3+6 = 9 over 4·1·3 = 12
    assert(out(("b", "c")) === (9L, 12L))
    // discounted mass never exceeds 1: p_num <= p_den on every row
    assert(out.values.forall { case (n, d) => n <= d })
  }
}
