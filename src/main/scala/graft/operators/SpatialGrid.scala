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

  /** All pairs (a_id < b_id, dist2) within radius r, via the 3×3
    * neighborhood grid join. */
  def pairsWithin(pts: DataFrame, r: Long): DataFrame = {
    val probe = pts
      .select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
        col("cx"), col("cy"))
      .withColumn("d", explode(sequence(lit(0), lit(8))))
      .select(col("a_id"), col("ax"), col("ay"),
        (col("cx") + pmod(col("d"), lit(3)) - 1).as("jcx"),
        (col("cy") + expr("d div 3") - 1).as("jcy"))
    val build = pts.select(col("id").as("b_id"), col("x").as("bx"),
      col("y").as("by"), col("cx").as("jcx"), col("cy").as("jcy"))
    probe.join(build, Seq("jcx", "jcy"))
      .where(col("a_id") < col("b_id"))
      .withColumn("dist2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .where(col("dist2") <= lit(r * r))
      .select("a_id", "b_id", "dist2")
  }
}
