package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the most recent right row with the
  * same key whose ordering value is <= the left row's — the distributed
  * re-expression of reader's MostRecentMap.GetItem(ts) (reference:
  * lib/maputil/most_recent_map.go:23-46, binary search for the greatest
  * entry at-or-before ts), which reader keeps per key for streaming-CDC
  * "state at this position" lookups (writers/transfer/writer.go).
  *
  * Spark has no native as-of join, and the declarative encodings are
  * scale-traps: a `left.join(right, key && r.ts <= l.ts)` + groupBy-max
  * plans the range predicate as a BroadcastNestedLoopJoin (quadratic per
  * key), and range-bucketing explodes storage by the bucket fanout. The
  * scalable re-expression needs no join operator at all: union both sides,
  * hash-partition ONCE by key, sort within partitions by (ord, side, tie),
  * and carry the last non-null right-side image forward with an
  * ignore-nulls running window — O(n log n) per partition, one shuffle,
  * no candidate blowup, AQE-skew-splittable. At equal ord values the right
  * row sorts first, giving <= (inclusive) semantics; ties among right rows
  * resolve to the greatest tie-break column (last writer wins, the same
  * rule as latest-state compaction).
  */
object AsOfJoin {

  /** @param left    rows to enrich (all its columns are kept)
    * @param right   rows carrying the looked-up image
    * @param keyCols equality key shared by both sides
    * @param ordCol  ordering column (same name on both sides, e.g. event ts)
    * @param tieCol  right-side total tie-break within equal ord values
    * @param carry   right-side columns to attach (null when no right row
    *                precedes the left row)
    */
  def lastMatch(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      tieCol: String,
      carry: Seq[String]): DataFrame = {
    require(carry.forall(c => !left.columns.contains(c)),
      s"carry columns ${carry.mkString(",")} must not collide with left columns — rename the right side first")
    val leftPayload = left.columns.filterNot(c => keyCols.contains(c) || c == ordCol)

    // normalize both sides onto one schema: keys + ord + side + tie +
    // left payload (null on right rows) + the carried right-row IMAGE as
    // ONE struct (null on left rows). A single struct under one
    // ignore-nulls last() keeps the carried columns from the SAME right
    // row — per-column lasts would tear rows apart whenever the most
    // recent right row holds a null in one carried column (its value
    // would then come from an older row). unionByName keeps this robust
    // to column order.
    val imgType = org.apache.spark.sql.types.StructType(
      carry.map(c => right.schema(c)))
    val lNorm = left
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast(right.schema(tieCol).dataType))
      .select((keyCols.map(col) :+ col(ordCol) :+ col("_side") :+ col("_tie")) ++
        leftPayload.map(col) :+
        lit(null).cast(imgType).as("_r_img"): _*)
    val rNorm = right
      .withColumn("_side", lit(0))
      .withColumn("_tie", col(tieCol))
      .select((keyCols.map(col) :+ col(ordCol) :+ col("_side") :+ col("_tie")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(carry.map(col): _*).as("_r_img"): _*)

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol).asc, col("_side").asc, col("_tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lNorm.unionByName(rNorm)
      .withColumn("_img", last(col("_r_img"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(keyCols.map(col) ++ Seq(col(ordCol)) ++ leftPayload.map(col) ++
        carry.map(c => col(s"_img.$c").as(c)): _*)
  }

  /** NEAREST-match as-of join (pandas merge_asof direction='nearest'):
    * attach the right row minimizing |r.ord − l.ord| in EITHER direction.
    * Same join-free shape as [[lastMatch]] — union, ONE keyed
    * shuffle+sort — with TWO window functions over the same sorted
    * partition (Spark plans both in one Window node, no second exchange):
    * the backward ignore-nulls `last` carries the at-or-before image, the
    * forward ignore-nulls `first` (current row → unbounded following) the
    * strictly-after image; a null-safe map-side compare of the two
    * distances picks the winner, ties to the backward side (the
    * at-or-before convention). Backward resolves equal-ord right ties to
    * the greatest tie value (last writer, as lastMatch), forward to the
    * smallest (nearest in sort order) — both deterministic. `dir` labels
    * the chosen side ('back'/'fwd', null when no right row exists). */
  def nearestMatch(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      ordCol: String,
      tieCol: String,
      carry: Seq[String]): DataFrame = {
    require(carry.forall(c => !left.columns.contains(c)),
      s"carry columns ${carry.mkString(",")} must not collide with left columns — rename the right side first")
    val leftPayload = left.columns.filterNot(c => keyCols.contains(c) || c == ordCol)
    val imgType = org.apache.spark.sql.types.StructType(
      right.schema(ordCol).copy(name = "_ord") +: carry.map(c => right.schema(c)))
    val lNorm = left
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast(right.schema(tieCol).dataType))
      .select((keyCols.map(col) :+ col(ordCol) :+ col("_side") :+ col("_tie")) ++
        leftPayload.map(col) :+
        lit(null).cast(imgType).as("_r_img"): _*)
    val rNorm = right
      .withColumn("_side", lit(0))
      .withColumn("_tie", col(tieCol))
      .select((keyCols.map(col) :+ col(ordCol) :+ col("_side") :+ col("_tie")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(ordCol).as("_ord") +: carry.map(col): _*).as("_r_img"): _*)

    val ord = Seq(col(ordCol).asc, col("_side").asc, col("_tie").asc_nulls_last)
    val wBack = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val picked = lNorm.unionByName(rNorm)
      .withColumn("_back", last(col("_r_img"), ignoreNulls = true).over(wBack))
      .withColumn("_fwd", first(col("_r_img"), ignoreNulls = true).over(wFwd))
      .where(col("_side") === 1)
      .withColumn("_dir",
        when(col("_back").isNull && col("_fwd").isNull, lit(null).cast("string"))
          .when(col("_fwd").isNull, lit("back"))
          .when(col("_back").isNull, lit("fwd"))
          .when(col(ordCol) - col("_back._ord") <= col("_fwd._ord") - col(ordCol),
            lit("back"))
          .otherwise(lit("fwd")))
      .withColumn("_img",
        when(col("_dir") === "back", col("_back"))
          .when(col("_dir") === "fwd", col("_fwd")))
    picked.select(keyCols.map(col) ++ Seq(col(ordCol)) ++ leftPayload.map(col) ++
      carry.map(c => col(s"_img.$c").as(c)) :+ col("_dir").as("dir"): _*)
  }
}
