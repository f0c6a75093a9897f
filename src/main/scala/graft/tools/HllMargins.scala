package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Observability probe for sketch_reaggregate's HLL leg (not part of the
  * library surface): prints per-event-type merged-sketch estimate, exact
  * distinct, and relative error at a given sf dir. The compared query
  * output carries ok-booleans only — xxhash64 register values can't be
  * replayed by the SQL oracle, so the estimate can't ride the hash-compared
  * frame the way the CMS leg's does. When an `ok_bound` ever trips, run
  *   sbt 'runMain graft.tools.HllMargins /root/testdata/sf0.01'
  * to see by how much; measured margins live in PLANS.md ("sketch_distinct
  * / sketch_reaggregate observed HLL margins").
  */
object HllMargins {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    import graft.expressions.Hll
    val ev = graft.sources.Tables.events(spark, sfDir)
      .withColumn("day", expr("ts_ns div 86400000000000"))
    val daily = ev.groupBy("event_type", "day")
      .agg(Hll.sketch(col("user_id"), 12).as("sk"))
    val merged = daily.groupBy("event_type")
      .agg(Hll.estimate(Hll.merge(col("sk"))).as("est_merged"))
    val direct = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    val out = merged.join(direct, "event_type")
      .withColumn("err_pct",
        round((col("est_merged").cast("double") / col("n_exact").cast("double")
          - 1.0) * 100.0, 3))
      .orderBy("event_type")
    out.collect().foreach { r =>
      println(s"[hll-margin] sf=$sfDir type=${r.get(0)} est=${r.get(1)} " +
        s"exact=${r.get(2)} err_pct=${r.get(3)}")
    }
    spark.stop()
  }
}
