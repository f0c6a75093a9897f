package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => Tf}

/** Grid-bucketed spatial proximity machinery shared by the radius
  * self-join (`join_spatial_grid`) and the bounded kNN join
  * (`join_spatial_knn`).
  *
  * Completeness argument: with cell side = r, two points within Euclidean
  * distance r differ by at most one cell per axis, so exploding each
  * probe point to its 3×3 cell neighborhood and equi-joining on the cell
  * key finds every qualifying pair — and exactly once, because the
  * smaller id's explode meets the larger id's cell through exactly one
  * offset. Exact integer dist² verification; no sqrt, no floats.
  *
  * The synthetic coordinate side scales as 2582·⌈√n⌉ so point density
  * (and output-per-point) is constant across scale factors; a fixed side
  * would make the pair count quadratic in corpus size. */
object SpatialGrid {

  /** Density-normalized synthetic points from a key column: (id, x, y,
    * cx, cy) with cell side r. The one-row count broadcast is the
    * mixture_rebalance scalar shape. */
  def points(keys: DataFrame, idCol: String, r: Long): DataFrame = {
    val ids = keys.select(col(idCol).as("id"))
    val stats = ids.agg(count(lit(1)).as("n"))
    ids.crossJoin(broadcast(stats))
      .withColumn("side", expr("2582 * cast(ceil(sqrt(cast(n as double))) as long)"))
      .withColumn("h60", Tf.hash60(col("id").cast("string")))
      .withColumn("x", pmod(col("h60"), col("side")))
      .withColumn("y", pmod(expr("h60 div side"), col("side")))
      .withColumn("cx", expr(s"x div $r"))
      .withColumn("cy", expr(s"y div $r"))
      .select("id", "x", "y", "cx", "cy")
  }

  /** All pairs (a_id < b_id, dist2) within radius r, via the HALF
    * neighborhood grid join: each probe point explodes to only the 5
    * offsets {(0,0),(1,0),(−1,1),(0,1),(1,1)} instead of the full 3×3.
    * For any cell delta d ∈ {−1,0,1}² exactly one of d, −d is in the
    * offset set (both coincide at (0,0)), so every cross-cell pair within
    * r is generated exactly once — whichever endpoint sits in the
    * (cy,cx)-lexicographically smaller cell is the probe — and same-cell
    * pairs, the only ones generated in both orientations, are deduped by
    * the in-cell id rule. Probe explode volume drops 9n → 5n and candidate
    * pairs from 2× to ~1× the qualifying set (the r11 verdict's 100 TB
    * shuffle note); the completeness theorem is unchanged. Because probe/
    * build orientation now follows cell order rather than id order, the
    * output normalizes to a_id < b_id at the end. */
  def pairsWithin(pts: DataFrame, r: Long): DataFrame = {
    val offs = Seq((0, 0), (1, 0), (-1, 1), (0, 1), (1, 1))
    val probe = pts
      .select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
        col("cx"), col("cy"))
      .withColumn("o", explode(array(offs.map { case (dx, dy) =>
        struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")) }: _*)))
      .select(col("a_id"), col("ax"), col("ay"),
        (col("cx") + col("o.dx")).as("jcx"),
        (col("cy") + col("o.dy")).as("jcy"),
        (col("o.dx") === 0L && col("o.dy") === 0L).as("same_cell"))
    val build = pts.select(col("id").as("b_id"), col("x").as("bx"),
      col("y").as("by"), col("cx").as("jcx"), col("cy").as("jcy"))
    probe.join(build, Seq("jcx", "jcy"))
      .where(!col("same_cell") || col("a_id") < col("b_id"))
      .withColumn("dist2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .where(col("dist2") <= lit(r * r))
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"), col("dist2"))
  }
}
