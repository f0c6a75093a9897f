package graft
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-loop tool (r16): build an APPROXIMATE scaled-up copy of a testdata
  * dir under /tmp for same-machine scale A/Bs — this sandbox carries only
  * sf{0.001,0.01,0.1} and the driver's generator is not available, but the
  * optimization round needs scale evidence (sf0.1 is overhead-bound: the
  * r15 driver measured 57/58 lanes no faster on 32 cores than 8).
  *
  * Key-bearing tables are unioned as `copies` key-shifted replicas
  * (disjoint key ranges, same distributions), so graph lanes see a
  * `copies`-times larger hash digraph, stream lanes a larger keyed state,
  * and agg lanes more rows per group. `documents` is copied ONCE,
  * unscaled: replicating near-identical texts would explode the LSH
  * near-dup pair graph quadratically and measure a different problem.
  * NOT driver data; never used for correctness gates — measurement only.
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val copies = args(2).toInt
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def shifted(name: String, shiftCols: Map[String, Long => Column]): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val out = (0 until copies).map { i =>
        shiftCols.foldLeft(base) { case (df, (c, f)) =>
          df.withColumn(c, f(i.toLong))
        }
      }.reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaledata] $name x$copies -> $dst")
    }
    def copy(name: String): Unit = {
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaledata] $name x1 -> $dst")
    }

    val custN = spark.read.parquet(s"$src/customer.parquet").count()
    val ordN = spark.read.parquet(s"$src/orders.parquet")
      .agg(max(col("o_orderkey"))).head().getLong(0) + 1
    val evN = spark.read.parquet(s"$src/events.parquet")
      .agg(max(col("event_id"))).head().getLong(0) + 1
    val userN = spark.read.parquet(s"$src/events.parquet")
      .agg(max(col("user_id"))).head().getLong(0) + 1

    shifted("customer", Map(
      "c_custkey" -> (i => col("c_custkey") + lit(i * custN))))
    shifted("orders", Map(
      "o_orderkey" -> (i => col("o_orderkey") + lit(i * ordN)),
      "o_custkey" -> (i => col("o_custkey") + lit(i * custN))))
    shifted("lineitem", Map(
      "l_orderkey" -> (i => col("l_orderkey") + lit(i * ordN))))
    shifted("events", Map(
      "event_id" -> (i => col("event_id") + lit(i * evN)),
      "user_id" -> (i => col("user_id") + lit(i * userN))))
    Seq("part", "supplier", "nation", "region", "documents", "embeddings")
      .foreach(copy)
    spark.stop()
  }
}
