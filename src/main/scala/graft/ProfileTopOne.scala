package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only: A/B the TopOneWindowToMinMaxBy rule on the latest-state shape
  * (row_number()=1 over a keyed window) at a given SF. Prints both wall
  * times and the per-variant plan head. */
object ProfileTopOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def latestState = {
      val ev = graft.sources.Tables.events(spark, sfDir)
      val w = Window.partitionBy("user_id").orderBy(col("ts_ns").desc, col("event_id").desc)
      ev.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
    }
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def force(): Unit = // full materialization, as Bench does
      latestState.write.mode("overwrite").format("noop").save()

    def withRuleOff[T](f: => T): T = {
      spark.conf.set("spark.sql.optimizer.excludedRules",
        "graft.plans.TopOneWindowToMinMaxBy")
      try f finally spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
    // discarded warm-up of BOTH variants: JIT, parquet footers, page cache
    force(); withRuleOff(force())
    // alternate order so neither variant systematically inherits the warmth
    (1 to 2).foreach { round =>
      if (round % 2 == 1) {
        time(s"rule ON  (round $round)")(force())
        withRuleOff(time(s"rule OFF (round $round)")(force()))
      } else {
        withRuleOff(time(s"rule OFF (round $round)")(force()))
        time(s"rule ON  (round $round)")(force())
      }
    }
    spark.stop()
  }
}
