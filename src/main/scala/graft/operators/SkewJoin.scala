package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated joins.
  *
  * First line of defense at scale is AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — prefer it.
  * Salting is the explicit fallback for the pathological case AQE can't
  * fix: ONE key so hot that a single shuffle partition exceeds executor
  * memory even after splitting, in a join whose other side is too big to
  * broadcast. The hot key's rows are scattered over `saltFactor` shuffle
  * partitions; the other side is replicated `saltFactor` ways so every
  * (key, salt) bucket still finds its match. Result set is provably
  * identical to the plain join.
  */
object SkewJoin {

  /** Inner-join `big` (skewed) with `small` (replicable) on `key`.
    * `big`'s salt is derived deterministically from row CONTENT
    * (xxhash64 over `saltCols`, or all of `big`'s columns when empty) —
    * never from monotonically_increasing_id or rand, which recompute
    * differently on shuffle map-task retry / speculative execution and
    * silently drop or duplicate rows (the SPARK-23207 hazard).
    * `small` is exploded saltFactor times. */
  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      saltCols: Seq[String] = Nil): DataFrame = {
    require(saltFactor > 0)
    val basis = (if (saltCols.nonEmpty) saltCols else big.columns.toSeq).map(col)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(basis: _*), lit(saltFactor.toLong)))
    val repl = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    saltedBig
      .join(repl, Seq(key, "__salt"))
      .drop("__salt")
  }
}
