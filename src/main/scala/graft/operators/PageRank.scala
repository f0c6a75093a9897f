package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Power-iteration PageRank (Page et al. 1999) in EXACT scaled-integer
  * arithmetic so the fixed-round scores replay bit-for-bit cross-engine:
  * ranks are BIGINT mass at scale 1e9, the damping step is the integer
  * form (pr·17) div (20·deg) — α = 17/20 = 0.85, truncating division on
  * both Spark (`div`) and DuckDB (`//`), identical because all operands
  * are non-negative — and the teleport term is the constant
  * (1−α)·scale = 150,000,000. Mass lost to truncation remainders and
  * dangling nodes is NOT redistributed: the iteration is a deterministic
  * contraction, not a stochastic simulation, and determinism is what the
  * correctness gate prices.
  *
  * Reference behavior (cf. reader's analytics surface: no graph
  * counterpart — this is the centrality member Spark adds to the graph
  * tier alongside CC/SCC/BFS/label propagation/TextRank; TextRank.scala
  * is the damped-iteration cousin on the word graph).
  *
  * Scale shape: per round ONE keyed join (ranks onto edges by src), one
  * keyed agg into dst, one left join back onto the node set — everything
  * partitioned by node id; localCheckpoint truncates the iterated plan
  * (the LabelProp/Scc convention). Rank values stay far inside int64:
  * pr ≤ maxInDeg^rounds · scale, and the hash graph's in-degrees are
  * Poisson-thin. */
object PageRank {

  val Scale = 1000000000L // initial mass per node
  val Teleport = 150000000L // (1 - 17/20) * Scale

  /** @param nodes (node: long) — vertex set
    * @param edges (src, dst: long) — DIRECTED, deduped
    * @param rounds synchronous power-iteration rounds
    * @return (node, pr: long) final scaled-integer ranks */
  def ranks(nodes: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, "src").localCheckpoint()
    var pr = nodes.select(col("node"), lit(Scale).as("pr"))
    for (_ <- 1 to rounds) {
      val contrib = withDeg
        .join(pr.select(col("node").as("src"), col("pr")), "src")
        .withColumn("c", expr(s"(pr * 17) div (20 * deg)"))
        .groupBy(col("dst").as("node")).agg(sum("c").as("cin"))
      pr = pr.select("node")
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(Teleport) + coalesce(col("cin"), lit(0L))).as("pr"))
        .localCheckpoint()
    }
    pr
  }
}
