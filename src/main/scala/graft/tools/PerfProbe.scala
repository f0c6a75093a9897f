package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B probe for lane hotspots (not part of the library surface).
  * Usage: runMain graft.tools.PerfProbe <sfDir> */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    val raw = spark.read.parquet(s"$dir/lineitem.parquet")
    time("warmup count")(raw.count())
    val li = raw.select(
      col("l_quantity").cast("long").as("q"),
      expr("cast(cast(l_extendedprice as decimal(12,2)) * 100 as bigint)").as("p"),
      expr("cast(cast(l_discount as decimal(4,2)) * 100 as bigint)").as("d"),
      expr("cast(cast(l_tax as decimal(4,2)) * 100 as bigint)").as("t"))
    time("A: casts only, count(q+p+d+t)")(
      li.agg(sum(col("q") + col("p") + col("d") + col("t"))).collect())
    time("B: casts + 4 sums")(
      li.agg(sum("q"), sum("p"), sum("d"), sum("t")).collect())
    time("C: + 10 products as long sums (overflowing sums ok? no—masked)")(
      li.agg(sum(col("q") * col("q")), sum(col("d") * col("d")), sum(col("t") * col("t")),
        sum(col("q") * col("d")), sum(col("q") * col("t")), sum(col("d") * col("t"))).collect())
    time("D: p*p hi/lo only")(
      li.agg(sum(expr("(p*p) div 1073741824")), sum(expr("(p*p) % 1073741824"))).collect())
    time("E: double-path moments (no decimal cast)")(
      raw.select((col("l_extendedprice") * 100).cast("long").as("p"))
        .agg(sum(expr("(p*p) div 1073741824")), sum(expr("(p*p) % 1073741824"))).collect())
    spark.stop()
  }
}
