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

  /** Result of [[hybridInnerJoin]]: the joined rows plus the hot-key frame
    * (exposed so callers can assert/report non-vacuity of the hot lane). */
  final case class HybridJoin(result: DataFrame, hotKeys: DataFrame)

  /** Hot-key hybrid inner join — the OTHER standard skew mitigation next
    * to salting: instead of scattering a hot key's rows across salted
    * partitions, rows whose key is HOT (count ≥ `hotMultiple` × the mean
    * per-key count) are routed through a BROADCAST join against the small
    * side's hot slice — the heavy rows never shuffle at all — while cold
    * rows take the normal keyed shuffle join. Result is provably identical
    * to the plain join: the two lanes partition `big` by hot-key
    * membership, and each lane joins the full matching slice of `small`.
    *
    * Scale shape: the hot-key census is one keyed agg with map-side
    * partials; the hot set is BOUNDED by construction (a key needs ≥
    * hotMultiple/|keys| of all rows to qualify, so |hot| ≤
    * |keys|/hotMultiple) and safely broadcast; the threshold is RELATIVE
    * (cnt·|keys| ≥ hotMultiple·total, exact integer cross-multiply) so the
    * routing is scale-invariant — no retuning as the corpus grows. The
    * one-row (total, |keys|) frame broadcasts onto the metadata-scale
    * counts frame (the documented one-row-scalar shape). At 100 TB the
    * counts frame would be persisted; here it is cheap relative to the
    * join and recomputes once per consuming branch.
    */
  def hybridInnerJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      hotMultiple: Long = 10L): HybridJoin = {
    require(hotMultiple > 0)
    val counts = big.groupBy(key).agg(count(lit(1)).as("__cnt"))
    val tot = counts.agg(sum("__cnt").as("__tot"), count(lit(1)).as("__k"))
    val hotKeys = counts.crossJoin(broadcast(tot))
      .where(col("__cnt") * col("__k") >= lit(hotMultiple) * col("__tot"))
      .select(col(key))
    val bigHot   = big.join(broadcast(hotKeys), Seq(key), "semi")
    val bigCold  = big.join(broadcast(hotKeys), Seq(key), "anti")
    val smallHot = small.join(broadcast(hotKeys), Seq(key), "semi")
    val hotLane  = bigHot.join(broadcast(smallHot), Seq(key))
    val coldLane = bigCold.join(small, Seq(key))
    HybridJoin(hotLane.unionByName(coldLane), hotKeys)
  }
}
