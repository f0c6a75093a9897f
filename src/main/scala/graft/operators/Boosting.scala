package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gradient-boosted regression stumps (Friedman 2001's gradient boosting
  * machine under squared loss, depth-1 base learners) — the boosting
  * counterpart of DecisionTree's bagging: where ml_forest averages
  * independently-grown trees, boosting grows them SEQUENTIALLY, each stump
  * fit to the residuals the previous rounds left behind.
  *
  * Cost model (the 100 TB point): each round is ONE corpus pass — a keyed
  * (feature, bucket) cell agg with map-side combine into ≤ Σ|buckets|
  * cells — and the residual update is a one-row broadcast + narrow map,
  * so R rounds cost R scans (each re-deriving the narrow residual chain:
  * round t's scan replays t broadcast CASE hops, all map-side — the
  * ml_tree no-corpus-checkpoint discipline; materializing residuals would
  * write the corpus to disk every round).
  *
  * Exactness: residuals stay BIGINT throughout. Squared loss makes the
  * optimal leaf value the mean residual; the learning rate η = 1/lrDenom
  * and the mean fold into ONE defined integer division
  * v = S_leaf div (lrDenom · n_leaf) — `div`/`//` truncate toward zero in
  * BOTH engines (verified: -7 div 2 = -3 in Spark and DuckDB), so the
  * update replays exactly. The split score (variance reduction ∝
  * S_L²/n_L + S_R²/n_R) finishes in fixed-order IEEE from exact
  * DECIMAL(38,0) numerators (S ≤ Σ|y| ≈ 5.6e11 at sf10 ⇒ S² ≈ 3e23,
  * inside 38 digits; DuckDB replays via HUGEINT → VARCHAR-parse → DOUBLE,
  * the profile_benford convention), and the argmax tie-breaks
  * deterministically on (score DESC, feature, bucket) — planned as
  * TakeOrderedAndProject, never an unpartitioned window. The per-round
  * SSE is maintained in CLOSED FORM from the cell stats
  * (Σ(r−v)² = Q − 2(v_L·S_L + v_R·S_R) + n_L·v_L² + n_R·v_R², all int64),
  * so loss tracking costs no extra corpus pass.
  *
  * Reference scope note: artie-labs/reader has no ML tier; this lane is
  * brief-side (training-data pipeline: learned quality/routing models
  * fitted in-warehouse), composing the ml_split_gini/ml_tree machinery.
  */
object Boosting {

  /** Fit `rounds` boosting rounds of depth-1 stumps to `targetCol` (a
    * BIGINT, e.g. cents) over pre-bucketed BIGINT `features`.
    *
    * @return one row per round: (round, feature, threshold_bucket,
    *   n_left, sum_left, n_right, sum_right, v_left, v_right, score,
    *   sse_before, sse_after) — the fitted model plus its loss curve,
    *   every column exact except the IEEE-pinned score. */
  def fitStumps(data: DataFrame, features: Seq[String], targetCol: String,
      rounds: Int, lrDenom: Long = 8L): DataFrame = {
    require(features.nonEmpty && rounds >= 1, "need features and rounds >= 1")
    val stackExpr = s"stack(${features.size}, " +
      features.map(f => s"'$f', $f").mkString(", ") + ") as (feature, bucket)"
    // Exact-square helper: casts a BIGINT sum to DECIMAL(19,0) so that the
    // PRODUCT of two such casts is promoted by Spark to DECIMAL(38,0)
    // ((19,0)x(19,0) -> p=19+19+1 capped at 38, s=0) — i.e. the squared
    // numerators below are exact. Only valid for a single binary product:
    // do NOT reuse for sums or chained products, where (19,0) inputs would
    // not be re-promoted and could overflow.
    def d19(c: Column) = c.cast("decimal(19,0)")
    // Input materialized ONCE (r15): round t's scan re-derived the narrow
    // input from parquet plus t broadcast CASE hops — R rounds = R parquet
    // re-scans of the same projection. One eager localCheckpoint turns
    // each round's pass into a columnar block read; the residual chain
    // itself stays lazy (materializing residuals per round was measured
    // as a loss and remains rejected — see the scaladoc).
    var cur = data.withColumn("r", col(targetCol).cast("long"))
      .localCheckpoint(true)
    var out: Option[DataFrame] = None
    for (t <- 0 until rounds) {
      val cells = cur.select(expr(stackExpr), col("r"))
        .groupBy("feature", "bucket")
        .agg(count(lit(1)).as("cn"), sum("r").as("sr"),
          sum(col("r") * col("r")).as("sq"))
      val wf = Window.partitionBy("feature").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy("feature")
      // n, s, q are corpus-global (every row lands in every feature's
      // partition exactly once) — reading them off the candidate's own
      // feature partition avoids a second corpus pass.
      val stats = cells
        .withColumn("nl", sum("cn").over(wf))
        .withColumn("sl", sum("sr").over(wf))
        .withColumn("n", sum("cn").over(wt))
        .withColumn("s", sum("sr").over(wt))
        .withColumn("q", sum("sq").over(wt))
        .where(col("nl") < col("n"))
      val scored = stats
        .withColumn("nr", col("n") - col("nl"))
        .withColumn("sr_r", col("s") - col("sl"))
        .withColumn("score",
          (d19(col("sl")) * d19(col("sl"))).cast("double") / col("nl").cast("double")
            + (d19(col("sr_r")) * d19(col("sr_r"))).cast("double") / col("nr").cast("double"))
      // Global argmax over the O(Σbuckets) candidate frame: sort+limit
      // plans TakeOrderedAndProject (no unpartitioned window).
      val best = scored
        .orderBy(col("score").desc, col("feature"), col("bucket"))
        .limit(1)
        .withColumn("v_l", expr(s"sl div ($lrDenom * nl)"))
        .withColumn("v_r", expr(s"sr_r div ($lrDenom * nr)"))
        .withColumn("sse_after", col("q")
          - lit(2L) * (col("v_l") * col("sl") + col("v_r") * col("sr_r"))
          + col("nl") * col("v_l") * col("v_l")
          + col("nr") * col("v_r") * col("v_r"))
        .localCheckpoint() // one row — metadata
      val row = best.select(lit(t.toLong).as("round"), col("feature"),
        col("bucket").cast("long").as("threshold_bucket"),
        col("nl").as("n_left"), col("sl").as("sum_left"),
        col("nr").as("n_right"), col("sr_r").as("sum_right"),
        col("v_l").as("v_left"), col("v_r").as("v_right"), col("score"),
        col("q").as("sse_before"), col("sse_after"))
      out = Some(out.map(_.union(row)).getOrElse(row))
      val fval = features.tail.foldLeft(
        when(col("bf") === features.head, col(features.head))) {
        (acc, f) => acc.when(col("bf") === f, col(f))
      }
      cur = cur.crossJoin(broadcast(best.select(col("feature").as("bf"),
          col("bucket").as("bb"), col("v_l"), col("v_r"))))
        .withColumn("r", col("r")
          - when(fval <= col("bb"), col("v_l")).otherwise(col("v_r")))
        .drop("bf", "bb", "v_l", "v_r")
    }
    out.get
  }
}
