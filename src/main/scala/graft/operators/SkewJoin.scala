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
    * `big`'s salt is derived from a per-row id (uniform within a hot key);
    * `small` is exploded saltFactor times. */
  def saltedInnerJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor.toLong)))
    val repl = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    saltedBig
      .join(repl, Seq(key, "__salt"))
      .drop("__salt")
  }
}
