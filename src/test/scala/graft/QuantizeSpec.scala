package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => Vf}

class QuantizeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val rnd = new scala.util.Random(5)
  private val vecs = (1 to 100).map(i =>
    (i.toLong, Array.fill(32)(rnd.nextGaussian() * (1 + i % 5)))).toSeq
  private val df = vecs.toDF("id", "v")
    .select(col("id"), col("v").cast("array<double>").as("v"))
    .withColumn("scale", Vf.quantScale(col("v")))
    .withColumn("q", Vf.quantize(col("v"), col("scale")))

  test("codes stay in [-127, 127]") {
    val mx = df.select(array_max(transform(col("q"), c => abs(c))).as("m"))
      .agg(max("m")).head().getInt(0)
    assert(mx <= 127)
  }

  test("dequantization error bounded by scale/2") {
    val bad = df
      .where(Vf.quantMaxErr(col("v"), col("q"), col("scale")) > col("scale") * 0.5 + 1e-12)
      .count()
    assert(bad === 0L)
  }

  test("zero vector quantizes to zeros with scale 0, no division error") {
    val z = Seq((1L, Array.fill(8)(0.0))).toDF("id", "v")
      .select(col("id"), col("v").cast("array<double>").as("v"))
      .withColumn("scale", Vf.quantScale(col("v")))
      .withColumn("q", Vf.quantize(col("v"), col("scale")))
      .head()
    assert(z.getAs[Double]("scale") === 0.0)
    assert(z.getAs[Seq[Int]]("q").forall(_ === 0))
  }

  test("reconstruction preserves direction: cosine(v, dequant) > 0.995") {
    val worst = df
      .withColumn("deq", zip_with(col("q"), col("v"),
        (qi, _) => qi.cast("double") * col("scale")))
      .select(Vf.cosine(col("v"), col("deq")).as("c"))
      .agg(min("c")).head().getDouble(0)
    assert(worst > 0.995, s"worst cosine $worst")
  }
}
