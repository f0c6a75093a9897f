package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact prefix sum over an ordered key — without the
  * single-partition unpartitioned window PlanHygieneSpec bans.
  *
  * The decomposition is the classic two-phase scan: bucket the ordinal
  * (`bucket = ord div bucketWidth`), aggregate per-bucket totals (ONE keyed
  * agg with map-side partials), prefix those totals driver-side (the bucket
  * table is input/bucketWidth rows — metadata-scale, the same bounded-
  * driver-state argument as Packing's per-length table), broadcast the
  * bucket offsets back, and finish with a window PARTITIONED by bucket for
  * the within-bucket running sum. Nothing depends on physical partitioning,
  * so the result is identical under repartition/AQE re-plans.
  *
  * Complements [[Packing.packByTokenBudget]]: Packing decomposes its prefix
  * sum algebraically by VALUE (per-length suffix sums) because its order is
  * length-descending; this operator handles the general by-ORDINAL case any
  * running-total workload needs (file compaction planning, cumulative
  * metrics, offset assignment).
  */
object PrefixSum {

  /** Inclusive prefix sum of `valCol` over ascending distinct `ordCol`
    * longs. @return input columns + `cum`. */
  def inclusive(
      df: DataFrame,
      ordCol: String,
      valCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val in = df.select(col(ordCol).cast("long").as(ordCol),
      col(valCol).cast("long").as(valCol))
      .withColumn("__bucket", expr(s"$ordCol div ${bucketWidth}L"))

    val perBucket = in.groupBy("__bucket")
      .agg(sum(col(valCol)).as("__total"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val before = perBucket.scanLeft(0L)(_ + _._2)
    val spark = df.sparkSession
    import spark.implicits._
    val offsets = perBucket.map(_._1).zip(before).toSeq
      .toDF("__bucket", "__before")

    val w = Window.partitionBy("__bucket").orderBy(col(ordCol))
    in.join(broadcast(offsets), Seq("__bucket"))
      .withColumn("cum", col("__before") + sum(col(valCol)).over(w))
      .select(col(ordCol), col(valCol), col("cum"))
  }
}
