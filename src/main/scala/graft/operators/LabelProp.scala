package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Synchronous label propagation (Raghavan et al. 2007) made
  * DETERMINISTIC: each node adopts the majority label among its neighbors,
  * ties broken by count desc then MIN label — the published algorithm's
  * random tie-break replaced with a total order so the fixpoint is
  * replayable cross-engine and across runs.
  *
  * Reference behavior (cf. reader's analytics surface: grouping/graph
  * summaries, e.g. transformers and destination rollups — no direct
  * counterpart; this is the community-detection member Spark adds to the
  * graph tier alongside CC/SCC/BFS).
  *
  * Scale shape: per round ONE keyed join (labels onto edges), one
  * (node, label) count agg, one per-node window argmax — everything
  * partitioned by node; localCheckpoint truncates the iterated plan (the
  * textrank/Scc convention). Isolated nodes keep their own label. */
object LabelProp {

  /** @param nodes (node: long) — vertex set
    * @param edges (u, v: long) — UNDIRECTED adjacency (both directions
    *   present, deduped); v's label votes for u
    * @param rounds synchronous rounds
    * @return (node, label: long) final labels */
  def communities(nodes: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    val w = Window.partitionBy("u").orderBy(col("cnt").desc, col("label"))
    var labels = nodes.select(col("node"), col("node").as("label"))
    for (_ <- 1 to rounds) {
      val newl = edges
        .join(labels.select(col("node").as("v"), col("label")), "v")
        .groupBy("u", "label").agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("u").as("node"), col("label").as("nl"))
      labels = labels.join(newl, Seq("node"), "left")
        .select(col("node"), coalesce(col("nl"), col("label")).as("label"))
        .localCheckpoint()
    }
    labels
  }
}
