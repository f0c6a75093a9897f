package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test splitting for dataset curation.
  *
  * `df.randomSplit` is the wrong tool for a 100 TB corpus: its assignment
  * depends on partition layout and seed plumbing, so a backfill, a
  * repartition, or AQE re-planning silently reassigns rows between splits —
  * leakage between train and eval. A content hash of the stable row id is
  * reproducible anywhere: the same row lands in the same split on every
  * rerun, engine, and partitioning, and strata (language, source) can be
  * split independently by hashing within the stratum. Map-only — no
  * shuffle, no state; the md5 is codegen'd.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the row id: first 60 bits of
    * md5(id) mod buckets (the same construction both DuckDB and any other
    * SQL engine can replay for audit — see the `sample_split` oracle). */
  def hashBucket(id: Column, buckets: Int): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long") % buckets

  /** Assign a named split per row: `cut` points are cumulative percents,
    * e.g. Seq(("train", 80), ("valid", 90), ("test", 100)). */
  def assignSplit(id: Column, cuts: Seq[(String, Int)]): Column = {
    require(cuts.nonEmpty && cuts.last._2 == 100, "cuts must be cumulative percents ending at 100")
    val b = hashBucket(id, 100)
    cuts.init.foldRight(lit(cuts.last._1): Column) { case ((name, upTo), rest) =>
      when(b < upTo, lit(name)).otherwise(rest)
    }
  }

  /** Deterministic reservoir: a uniform k-row sample PER STRATUM, stable
    * under repartition, backfill, and engine change — rank rows inside each
    * stratum by a salted content hash and keep the first k. A classic
    * reservoir (Vitter's R) depends on encounter order, so two runs of the
    * same pipeline disagree; hash-ranking is order-free and SQL-replayable.
    *
    * Scale shape: ONE keyed shuffle on the stratum. Spark 3.5+ plans the
    * `row_number <= k` filter as WindowGroupLimit — each map task keeps
    * only its local top-k per stratum BEFORE the exchange, so the shuffle
    * carries O(tasks x k) rows per stratum, not the stratum's full
    * contents (plan-asserted in SamplingSpec).
    *
    * Output adds `rk` (1..k inside the stratum, by hash order) and `h`
    * (the rank hash, for audit). */
  def reservoirPerKey(
      df: DataFrame, keys: Seq[String], idCol: String, k: Int,
      salt: String): DataFrame = {
    // `h` and `rk` are part of the OUTPUT contract (audit columns), so they
    // can't be renamed away — but withColumn would silently OVERWRITE
    // same-named input columns and corrupt the sample ordering. Refuse.
    require(!df.columns.contains("h") && !df.columns.contains("rk"),
      "reservoirPerKey emits audit columns 'h' and 'rk'; rename the " +
        "input's same-named columns first")
    val h = md5(concat(col(idCol).cast("string"), lit("|" + salt)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("h"), col(idCol)) // id tie-break: total order even on hash collision
    df.withColumn("h", h)
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
  }
}
