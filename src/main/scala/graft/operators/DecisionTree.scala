package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Level-wise exact-Gini decision tree — the multi-level composition of
  * the `ml_split_gini` stump primitive, built the way distributed tree
  * ensembles (GBDT/random forests) actually grow trees at scale: each
  * LEVEL costs ONE corpus pass (a keyed (node, feature, bucket) agg with
  * map-side combine into ≤ nodes×features×buckets cells), candidate
  * stats are prefix sums over that metadata frame, and split application
  * is a broadcast join + narrow map — depth d = d corpus scans, never a
  * per-node pass (the naive recursive form scans once per node: 2^d
  * scans).
  *
  * Node ids are binary-heap indices (root 1, children 2k / 2k+1); at
  * `level` only ids in [2^level, 2^{level+1}) may split, so a node that
  * froze earlier (no candidate row: a single bucket across every
  * feature) keeps its id and can never be re-split under an ambiguous
  * id. All counts exact BIGINT; the impurity finishes in fixed-order
  * IEEE from int64-exact operands (squares < 2^53 at sf10 — the
  * ml_split_gini argument), so the per-node argmin (gini, feature,
  * bucket) replays cross-engine. */
object DecisionTree {

  /** @param data pre-bucketed BIGINT feature columns + a 0/1 label
    * @param features feature column names (stacked per level)
    * @param labelCol 0/1 BIGINT label column
    * @param depth number of split levels (≥ 1)
    * @return (splits, assigned): splits = (node, feature,
    *   threshold_bucket, gini, n, n_pos) one row per INTERNAL node;
    *   assigned = data with the final leaf id in `node` */
  /** Forest variant: `data` carries a `tree` column (one row per (row,
    * bag-member tree) — deterministic hash bagging upstream), and every
    * level is STILL one pass: the cell agg keys by (tree, node, feature,
    * bucket), windows partition by (tree, node, feature), the argmin by
    * (tree, node), and split application broadcasts the per-(tree, node)
    * best frame — so training T trees costs the same number of corpus
    * scans as ONE tree over the T×bag-fraction-wide bagged union, not
    * T×depth passes. Returns (splits, assigned) with `tree` leading. */
  def fitBagged(data: DataFrame, features: Seq[String], labelCol: String,
      depth: Int): (DataFrame, DataFrame) = {
    require(features.nonEmpty && depth >= 1, "need features and depth >= 1")
    val stackExpr = s"stack(${features.size}, " +
      features.map(f => s"'$f', $f").mkString(", ") + ") as (feature, bucket)"
    // Materialize the bagged input ONCE (r15 measured fix): every level's
    // cell agg, the leaf census, and the caller's assigned consumers all
    // re-executed the input lineage — for the forest lanes that lineage is
    // scan + explode(T trees) + md5 bag-hash per row, recomputed depth+1
    // times. One eager localCheckpoint makes each pass a columnar block
    // read; blocks are freed on driver GC (the bench's inter-query GC).
    // This is the guide's "persist the signatures" trade: one materialize
    // vs depth+1 recomputes of a hash-heavy derivation.
    var cur = data.withColumn("node", lit(1L)).localCheckpoint(true)
    var splits: Option[DataFrame] = None
    for (level <- 0 until depth) {
      val lo = 1L << level
      val cells = cur.where(col("node") >= lo)
        .select(col("tree"), col("node"), expr(stackExpr), col(labelCol).as("label"))
        .groupBy("tree", "node", "feature", "bucket")
        .agg(count(lit(1)).as("cn"), sum("label").as("cp"))
      val wf = Window.partitionBy("tree", "node", "feature").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy("tree", "node", "feature")
      val stats = cells
        .withColumn("nl", sum("cn").over(wf))
        .withColumn("al", sum("cp").over(wf))
        .withColumn("n", sum("cn").over(wt))
        .withColumn("a", sum("cp").over(wt))
        .where(col("nl") < col("n"))
      val gini = stats.withColumn("g", giniCol)
      val wb = Window.partitionBy("tree", "node")
        .orderBy(col("g"), col("feature"), col("bucket"))
      val best = gini.withColumn("rn", row_number().over(wb)).where(col("rn") === 1)
        .select(col("tree"), col("node"), col("feature"),
          col("bucket").cast("long").as("threshold_bucket"),
          col("g").as("gini"), col("n"), col("a").as("n_pos"))
        .localCheckpoint()
      splits = Some(splits.map(_.union(best)).getOrElse(best))
      val fval = features.tail.foldLeft(
        when(col("bf") === features.head, col(features.head))) {
        (acc, f) => acc.when(col("bf") === f, col(f))
      }
      cur = cur.join(broadcast(best.select(col("tree"), col("node"),
          col("feature").as("bf"), col("threshold_bucket").as("bb"))),
          Seq("tree", "node"), "left")
        .withColumn("node", when(col("bf").isNull, col("node"))
          .otherwise(col("node") * 2
            + when(fval <= col("bb"), lit(0L)).otherwise(lit(1L))))
        .drop("bf", "bb")
    }
    (splits.get, cur)
  }

  /** Route rows through an already-fitted split table (the inference
    * half): `depth` broadcast-join hops, each advancing one level —
    * a row at a frozen/leaf id simply misses the join and stays. `data`
    * must carry the `tree` column when the splits do (forest scoring
    * replays every tree per row). Map-side only: the corpus never
    * shuffles, the split table is ≤ Σ 2^level rows per tree. */
  def applySplits(data: DataFrame, splits: DataFrame, features: Seq[String],
      depth: Int): DataFrame = {
    val keys = if (splits.columns.contains("tree")) Seq("tree", "node") else Seq("node")
    val fval = features.tail.foldLeft(
      when(col("bf") === features.head, col(features.head))) {
      (acc, f) => acc.when(col("bf") === f, col(f))
    }
    var cur = data.withColumn("node", lit(1L))
    for (_ <- 0 until depth) {
      cur = cur.join(broadcast(splits.select(
          keys.map(col) :+ col("feature").as("bf")
            :+ col("threshold_bucket").as("bb"): _*)),
          keys, "left")
        .withColumn("node", when(col("bf").isNull, col("node"))
          .otherwise(col("node") * 2
            + when(fval <= col("bb"), lit(0L)).otherwise(lit(1L))))
        .drop("bf", "bb")
    }
    cur
  }

  /** The ml_split_gini impurity in its pinned IEEE operation order —
    * shared by the single-tree and forest paths so their values agree. */
  private def giniCol: org.apache.spark.sql.Column =
    ((col("nl").cast("double")
      - (col("al") * col("al")
        + (col("nl") - col("al")) * (col("nl") - col("al"))).cast("double")
        / col("nl").cast("double")
      + (col("n") - col("nl")).cast("double")
      - ((col("a") - col("al")) * (col("a") - col("al"))
        + ((col("n") - col("nl")) - (col("a") - col("al")))
          * ((col("n") - col("nl")) - (col("a") - col("al")))).cast("double")
        / (col("n") - col("nl")).cast("double"))
      / col("n").cast("double"))

  def fit(data: DataFrame, features: Seq[String], labelCol: String,
      depth: Int): (DataFrame, DataFrame) = {
    require(features.nonEmpty && depth >= 1, "need features and depth >= 1")
    val stackExpr = s"stack(${features.size}, " +
      features.map(f => s"'$f', $f").mkString(", ") + ") as (feature, bucket)"
    // input materialized once — see fitBagged's r15 note
    var cur = data.withColumn("node", lit(1L)).localCheckpoint(true)
    var splits: Option[DataFrame] = None
    for (level <- 0 until depth) {
      val lo = 1L << level
      val cells = cur.where(col("node") >= lo)
        .select(col("node"), expr(stackExpr), col(labelCol).as("label"))
        .groupBy("node", "feature", "bucket")
        .agg(count(lit(1)).as("cn"), sum("label").as("cp"))
      val wf = Window.partitionBy("node", "feature").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy("node", "feature")
      val stats = cells
        .withColumn("nl", sum("cn").over(wf))
        .withColumn("al", sum("cp").over(wf))
        .withColumn("n", sum("cn").over(wt))
        .withColumn("a", sum("cp").over(wt))
        .where(col("nl") < col("n")) // right side must be non-empty
      // identical operation order to ml_split_gini — the IEEE replay claim
      val gini = stats.withColumn("g", giniCol)
      val wb = Window.partitionBy("node")
        .orderBy(col("g"), col("feature"), col("bucket"))
      val best = gini.withColumn("rn", row_number().over(wb)).where(col("rn") === 1)
        .select(col("node"), col("feature"),
          col("bucket").cast("long").as("threshold_bucket"),
          col("g").as("gini"), col("n"), col("a").as("n_pos"))
        .localCheckpoint() // ≤ 2^level rows — metadata
      splits = Some(splits.map(_.union(best)).getOrElse(best))
      val fval = features.tail.foldLeft(
        when(col("bf") === features.head, col(features.head))) {
        (acc, f) => acc.when(col("bf") === f, col(f))
      }
      cur = cur.join(broadcast(best.select(col("node"),
          col("feature").as("bf"), col("threshold_bucket").as("bb"))),
          Seq("node"), "left")
        .withColumn("node", when(col("bf").isNull, col("node"))
          .otherwise(col("node") * 2
            + when(fval <= col("bb"), lit(0L)).otherwise(lit(1L))))
        .drop("bf", "bb")
    }
    (splits.get, cur)
  }
}
