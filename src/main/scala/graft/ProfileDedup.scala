package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.expressions.{MinHashSig, Sketch}
import graft.functions.TextFunctions._
import graft.sources.Tables

/** Dev-only: stage-by-stage timing of the minhash pipeline. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }

    val docs = Tables.documents(spark, sfDir)
    val sets = docs.select(col("doc_id").as("id"),
      Sketch.column(graft.expressions.ShingleHashes(Sketch.expr(col("text")), 5, word = true)).as("sh"))
      .where(size(col("sh")) > 0)
    time("shingles.count")(sets.count())
    val hashed = sets
    time("hashed.count")(hashed.count())
    val sig = hashed.withColumn("sig",
      Sketch.column(MinHashSig(Sketch.expr(col("sh")), 128)))
    time("sig.count")(sig.count())
    val bands = sig.withColumn("bands", lshBandHashes(col("sig"), 32, 4))
    time("bands.count")(bands.count())
    val bt = bands.select(col("id"), posexplode(col("bands")))
      .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "band_hash")
    time("bandTable.count")(bt.count())
    val cand = bt.as("x").join(bt.as("y"), Seq("band_id", "band_hash"))
      .where(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    time("candidates.count")(cand.count())
    val shSets = bands.select(col("id"), col("sh"))
    val inter = Sketch.column(graft.expressions.SortedIntersectCount(
      Sketch.expr(col("sa.sh")), Sketch.expr(col("sb.sh"))))
    val out = cand
      .join(shSets.as("sa"), col("id_a") === col("sa.id"))
      .join(shSets.as("sb"), col("id_b") === col("sb.id"))
      .select(col("id_a"), col("id_b"),
        (inter.cast("double") / (size(col("sa.sh")) + size(col("sb.sh")) - inter)).as("jacc"))
      .where(col("jacc") >= 0.9)
    time("verified.count")(out.count())
    spark.stop()
  }
}
