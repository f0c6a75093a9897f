package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance: apply a CDC event batch to a maintained
  * (group → count, sum) aggregate WITHOUT re-reading the base table.
  *
  * This is what reader's warehouse consumers do downstream of the CDC
  * stream — keep an aggregate current from the change feed alone. The
  * classic delta rule: an update whose GROUP KEY moved is a delete from
  * the old group plus an insert into the new one, so every event explodes
  * into signed contributions:
  *
  *   c → (+1, +after_value)  @ after_group
  *   d → (−1, −before_value) @ before_group
  *   u → (−1, −before_value) @ before_group AND (+1, +after_value) @ after_group
  *
  * Cost at 100 TB: one narrow keyed agg over the EVENT BATCH (not the
  * corpus — deltas are |batch|-sized) + one outer join on the group key
  * against the |groups|-sized state. Sums are carried as DECIMAL so the
  * telescoping is exact — maintained state is bit-identical to a full
  * recompute, regardless of event order or partitioning (asserted by the
  * randomized spec and by the driver oracle, which recomputes from the
  * post-image table).
  *
  * `base` is (groupName, cnt BIGINT, total DECIMAL); groups whose count
  * reaches zero are dropped, matching what a recompute would produce.
  */
object IncrementalAgg {

  def maintain(
      base: DataFrame,
      events: DataFrame,
      opCol: String,
      beforeGroup: Column,
      afterGroup: Column,
      beforeValue: Column,
      afterValue: Column,
      groupName: String): DataFrame = {
    val minus = events.where(col(opCol).isin("d", "u"))
      .select(beforeGroup.as(groupName), lit(-1L).as("dc"), (-beforeValue).as("dv"))
    val plus = events.where(col(opCol).isin("c", "u"))
      .select(afterGroup.as(groupName), lit(1L).as("dc"), afterValue.as("dv"))
    val delta = minus.unionAll(plus)
      .groupBy(groupName)
      .agg(sum("dc").as("dc"), sum("dv").as("dv"))
    base.join(delta, Seq(groupName), "full_outer")
      .select(
        col(groupName),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("cnt"),
        (coalesce(col("total"), lit(0).cast("decimal(12,2)")) +
          coalesce(col("dv"), lit(0).cast("decimal(12,2)"))).as("total"))
      .where(col("cnt") > 0)
  }
}
