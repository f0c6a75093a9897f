package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Longest-path levels over a DAG — the second half of graph
  * condensation: contract SCCs (Scc.components), then rank the condensed
  * DAG by critical-path depth (level(v) = length of the longest path from
  * any source to v). Longest path is NP-hard on general graphs but linear
  * on DAGs; the distributed form is Bellman-Ford-style max-relaxation to
  * fixpoint, DOUBLE-STEPPED like the Scc fixpoints and — r15 —
  * DELTA-PROPAGATED with the state frame kept hash-partitioned + sorted
  * on the fold key (the Scc-coloring discipline): max-relaxation is
  * monotone and idempotent, so a node's outgoing contribution needs
  * re-pushing only in the round after its level changed. Each round
  * pushes only the changed set's levels one hop (twice) and folds them
  * into the level frame with a left join — an SMJ that scans the state in
  * place (LogicalRDD preserves partitioning/ordering through
  * localCheckpoint), where the previous full-frame relax re-joined and
  * re-shuffled ALL nodes' levels every round. Convergence in ⌈depth/2⌉
  * rounds; a CYCLE would diverge — the maxIters guard turns that into a
  * loud failure rather than an infinite loop, which is the correct
  * behavior for an operator whose contract is acyclic input. */
object DagLevels {

  /** @param nodes (node: long) — DAG vertex set
    * @param edges (src, dst: long) — DAG edges (acyclic; cycles fail the
    *   maxIters guard)
    * @return (node, level: long) — longest-path depth from any source */
  def levels(nodes: DataFrame, edges: DataFrame, maxIters: Int = 60): DataFrame = {
    // WEIGHTED SHORTCUT EDGES (r15, the Bfs discipline in max form): walk
    // es(w=1) ∪ es·es(w=2) and relax max(level + w). Every 2-path is a
    // w=2 edge, so a shortcut never claims a level an edge path couldn't,
    // and the base edges keep odd-length paths exact — the fixpoint is
    // the same longest-path function with half the rounds. Volume bound
    // Σ_v in(v)·out(v) ≤ maxOutDeg·|E| (condensation DAGs are sparse).
    val es = {
      val base = edges.select(col("src"), col("dst")).distinct()
      val sq = base.select(col("src"), col("dst").as("mid"))
        .join(base.select(col("src").as("mid"), col("dst")), Seq("mid"))
        .select(col("src"), col("dst")).distinct()
        .where(col("src") =!= col("dst"))
      base.withColumn("w", lit(1L)).union(sq.withColumn("w", lit(2L)))
        .localCheckpoint(true)
    }
    // one delta relaxation: push level+w from the changed set, fold max
    // into the state; chg marks nodes whose level actually grew
    def relax(l: DataFrame, ch: DataFrame): DataFrame = {
      val pushed = es
        .join(ch.select(col("node").as("src"), col("level")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(max(col("level") + col("w")).as("plvl"))
      l.join(pushed, Seq("node"), "left")
        .select(col("node"),
          greatest(col("level"), coalesce(col("plvl"), col("level"))).as("level"),
          (coalesce(col("plvl"), col("level")) > col("level")).as("chg"))
    }
    var lvl = nodes.select(col("node"), lit(0L).as("level"))
      .repartition(col("node")).sortWithinPartitions("node")
      .localCheckpoint(true)
    var changed = lvl
    var changedCount = changed.count()
    var iter = 0
    // DOUBLE-STEPPED: two relaxations share one lineage per
    // checkpoint+count — each step re-pushes exactly the set the previous
    // step grew, so the fixpoint is step-count-invariant and a round whose
    // last step grows nothing is converged. k = 4 measured NEGATIVE r15
    // (see Bfs.scala scaladoc): deeper un-checkpointed lineage re-scans
    // the state per extra step and loses more than the saved round.
    while (changedCount > 0) {
      var f = relax(lvl.select("node", "level"), changed.select("node", "level"))
      for (_ <- 2 to 2)
        f = relax(f.select("node", "level"),
          f.where(col("chg")).select("node", "level"))
      f = f.localCheckpoint(true)
      lvl = f.select("node", "level")
      changed = f.where(col("chg")).select("node", "level")
      changedCount = changed.count()
      iter += 1
      require(iter < maxIters,
        s"DAG level relaxation did not converge in $maxIters rounds — cyclic input?")
    }
    lvl
  }
}
