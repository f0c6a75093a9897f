package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Longest-path levels over a DAG — the second half of graph
  * condensation: contract SCCs (Scc.components), then rank the condensed
  * DAG by critical-path depth (level(v) = length of the longest path from
  * any source to v). Longest path is NP-hard on general graphs but linear
  * on DAGs; the distributed form is Bellman-Ford-style max-relaxation to
  * fixpoint — each round one keyed join + keyed max-agg over the edge
  * table, DOUBLE-STEPPED like the Scc fixpoints (two relaxations per
  * checkpoint + convergence count; the measured Scc finding — per-round
  * fixed overhead dominates on metadata-scale frames — transfers).
  * Convergence in ⌈depth/2⌉ rounds; monotone (levels only grow) and
  * bounded by depth, so the fixpoint is exact. A CYCLE would diverge —
  * the maxIters guard turns that into a loud failure rather than an
  * infinite loop, which is the correct behavior for an operator whose
  * contract is acyclic input. */
object DagLevels {

  /** @param nodes (node: long) — DAG vertex set
    * @param edges (src, dst: long) — DAG edges (acyclic; cycles fail the
    *   maxIters guard)
    * @return (node, level: long) — longest-path depth from any source */
  def levels(nodes: DataFrame, edges: DataFrame, maxIters: Int = 60): DataFrame = {
    val es = edges.select(col("src"), col("dst")).distinct().localCheckpoint(true)
    // one relaxation: level'(v) = max(level(v), max over preds(level(u)+1));
    // `old` rides inside the frame so change detection is a filter-count
    def relax(l: DataFrame): DataFrame = {
      val pushed = es.join(l.select(col("node").as("src"), col("level")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(max(col("level") + 1L).as("plvl"))
      l.join(pushed, Seq("node"), "left")
        .select(col("node"), col("old"),
          greatest(col("level"), coalesce(col("plvl"), col("level"))).as("level"))
    }
    var lvl = nodes.select(col("node"), lit(0L).as("level")).localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged) {
      val next = relax(relax(
          lvl.select(col("node"), col("level").as("old"), col("level"))))
        .localCheckpoint(true)
      val changed = next.where(col("level") > col("old")).count()
      lvl = next.select("node", "level")
      converged = changed == 0
      iter += 1
      require(iter < maxIters,
        s"DAG level relaxation did not converge in $maxIters rounds — cyclic input?")
    }
    lvl
  }
}
