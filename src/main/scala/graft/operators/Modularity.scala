package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One-level Louvain sweep (Blondel et al. 2008, phase 1, first pass)
  * made DETERMINISTIC and exact: every node evaluates its move gain
  * against the INITIAL singleton partition simultaneously (the published
  * algorithm's sequential node order is run-order-dependent and could
  * never replay cross-engine; the synchronous variant is the labelprop
  * discipline applied to modularity). From singletons, moving node i into
  * neighbor j's community has gain ∝ 2m·k_{i,in} − Σtot(c_j)·k_i =
  * 2m − k_i·k_j (k_{i,in} = 1 on a simple graph, Σtot = k_j) — an EXACT
  * BIGINT numerator, so the argmax and the move/stay decision replay
  * bit-identically in any engine. Ties break by smallest neighbor id.
  *
  * Reference behavior: no counterpart in reader (a CDC forwarder); this
  * is the modularity member of the graph tier beside label propagation —
  * the comparison baseline practitioners actually use.
  *
  * Scale shape: degrees and m are ONE keyed agg + a one-row broadcast;
  * the sweep is one keyed join (degrees onto edges) + one per-node window
  * argmax — everything partitioned by node id, no iteration, no collect. */
object Modularity {

  /** @param nodes (node: long) — vertex set
    * @param edges (u, v: long) — UNDIRECTED simple adjacency (both
    *   directions present, deduped, no self loops)
    * @return (node, label: long) — label = chosen target's node id for
    *   movers (positive gain), own id for stayers/isolated nodes */
  def sweep(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("u").as("node")).agg(count(lit(1)).as("k"))
    // each undirected edge appears twice in the symmetrized frame
    val m1 = edges.agg((count(lit(1)) / 2).cast("long").as("m"))
    val w = Window.partitionBy("u").orderBy(col("gain").desc, col("v"))
    val moves = edges
      .join(deg.select(col("node").as("u"), col("k").as("ku")), "u")
      .join(deg.select(col("node").as("v"), col("k").as("kv")), "v")
      .crossJoin(broadcast(m1))
      .withColumn("gain", lit(2L) * col("m") - col("ku") * col("kv"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .where(col("gain") > 0)
      .select(col("u").as("node"), col("v").as("target"))
    nodes.select("node").join(moves, Seq("node"), "left")
      .select(col("node"), coalesce(col("target"), col("node")).as("label"))
  }

  /** The WEIGHTED sweep — Louvain phase 2's working form: after
    * contracting communities to super-nodes, inter-community edge
    * multiplicities become weights and intra edges become self-loops.
    * Gain of moving super-node u into neighbor v's singleton community:
    * 2m·w(u,v) − K_u·K_v (K = weighted degree INCLUDING self-loops,
    * which carry Σtot but never k_{i,in}) — still exact BIGINT.
    *
    * @param nodes (node: long)
    * @param wedges (u, v, w: long) — ordered pairs INCLUDING u = v
    *   self-loop rows (w(A,A) = 2·intra edges, the contraction
    *   convention); for u ≠ v both orientations present
    * @return (node, label) */
  def sweepWeighted(nodes: DataFrame, wedges: DataFrame): DataFrame = {
    val deg = wedges.groupBy(col("u").as("node")).agg(sum("w").as("k"))
    val m1 = wedges.agg((sum(col("w")) / 2).cast("long").as("m"))
    val w = Window.partitionBy("u").orderBy(col("gain").desc, col("v"))
    val moves = wedges.where(col("u") =!= col("v"))
      .join(deg.select(col("node").as("u"), col("k").as("ku")), "u")
      .join(deg.select(col("node").as("v"), col("k").as("kv")), "v")
      .crossJoin(broadcast(m1))
      .withColumn("gain", lit(2L) * col("m") * col("w") - col("ku") * col("kv"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .where(col("gain") > 0)
      .select(col("u").as("node"), col("v").as("target"))
    nodes.select("node").join(moves, Seq("node"), "left")
      .select(col("node"), coalesce(col("target"), col("node")).as("label"))
  }

  /** Exact scaled modularity of a labeling: Q = q_num / (4m²) with
    * q_num = Σ_c (4m·e_c − Σtot_c²) — every term BIGINT (e_c = intra
    * edges of community c, Σtot_c = degree sum of its members; 4m·e_c
    * rides the doubled directed count 2m·e2_c so nothing ever divides).
    * Returns ONE row (q_num, q_den, n_communities). */
  def modularityScaled(labels: DataFrame, edges: DataFrame): DataFrame = {
    val m1 = edges.agg((count(lit(1)) / 2).cast("long").as("m"))
    val lab = labels.select(col("node"), col("label"))
    // e2_c = directed intra-pair count = 2·e_c
    val intra = edges
      .join(lab.select(col("node").as("u"), col("label").as("lu")), "u")
      .join(lab.select(col("node").as("v"), col("label").as("lv")), "v")
      .where(col("lu") === col("lv"))
      .groupBy(col("lu").as("label")).agg(count(lit(1)).as("e2"))
    val deg = edges.groupBy(col("u").as("node")).agg(count(lit(1)).as("k"))
    val tot = lab.join(deg, Seq("node"), "left")
      .groupBy("label").agg(sum(coalesce(col("k"), lit(0L))).as("sum_tot"))
    tot.join(intra, Seq("label"), "left")
      .withColumn("e2", coalesce(col("e2"), lit(0L)))
      .crossJoin(broadcast(m1))
      .agg(
        sum(lit(2L) * col("m") * col("e2") - col("sum_tot") * col("sum_tot"))
          .cast("long").as("q_num"),
        (first(col("m")) * first(col("m")) * 4L).cast("long").as("q_den"),
        count(lit(1)).as("n_communities"))
  }
}
