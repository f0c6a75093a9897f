package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sampled bounded-distance Brandes betweenness centrality over a directed
  * edge table — the path-criticality member of the graph tier beside
  * closeness (Σ-distance) and PageRank-style scores. Implements the
  * source-sampled estimator (Brandes–Pich 2007) restricted to shortest
  * paths of at most `maxHop` hops — the "bounded-distance betweenness"
  * variant of Brandes 2008 ("On variants of shortest-path betweenness
  * centrality and their generic computation"), whose dependency
  * accumulation is the SAME recurrence as the exact algorithm, just
  * truncated at the radius: long-range dependencies decay geometrically
  * and the bounded variant is the standard large-graph practice.
  *
  * Two level-synchronous BSP passes, both on (source, node)-keyed
  * metadata frames (the Bfs.distancesMulti compound-key discipline — k
  * sources ride ONE loop):
  *
  *  - FORWARD fuses BFS discovery with path counting: frontier at level d
  *    carries σ(s,v) = #shortest s→v paths; expansion is one edge join +
  *    anti-join against the visited set + keyed SUM(σ) (in-neighbor σ's
  *    add — exact BIGINT, order-free; σ ≤ outdeg^maxHop stays tiny).
  *  - BACKWARD walks levels maxHop-1 … 0 accumulating Brandes
  *    dependencies δ(v) = Σ_{w ∈ succ(v), dist(w)=dist(v)+1}
  *    σ_v/σ_w · (1 + δ(w)). δ is DOUBLE but every value replays
  *    bit-identically across engines ON ANY OUT-DEGREE: each term's
  *    op sequence is fixed (one exact-integer IEEE division, one add,
  *    one multiply), and the per-node sum is a SUCCESSOR-ORDERED
  *    left-to-right fold — sort_array(collect_list(struct(w, t))) then
  *    aggregate() — which DuckDB replays with SUM(t ORDER BY w): both
  *    engines' ordered sums are sequential IEEE folds (measured: DuckDB
  *    SUM(x ORDER BY k) is bit-identical to a left-to-right loop on
  *    order-sensitive magnitudes, stable under threads). This replaces
  *    the r13/r14 out-degree ≤ 2 commutativity precondition — no degree
  *    restriction remains.
  *
  * Cost: 2·maxHop keyed joins over frames of ≤ |sources|·|V| rows — no
  * corpus-sized shuffle anywhere; the edge table is deduped and
  * checkpointed once. Reference behavioral anchor: artie-labs/reader has
  * no graph engine; this lane exists for the training-data-pipeline tier
  * (influence/criticality scoring over link graphs).
  *
  * @param nodes  (node: long) real vertex ids; phantom hash targets may
  *               appear mid-walk (same semantics as Bfs: they relay paths)
  *               but are dropped from the OUTPUT
  * @param edges  (src, dst: long) directed edges, any out-degree (δ is
  *               successor-order folded — see above)
  * @param sources sampled BFS roots
  * @param maxHop  dependency radius (levels unrolled — keep small)
  * @return (s, node, dist, sigma, delta) for every node within maxHop of
  *         s — node ∈ nodes, node ≠ s; betweenness = Σ_s δ(s, v)
  */
object Betweenness {

  def sampled(nodes: DataFrame, edges: DataFrame, sources: Seq[Long],
      maxHop: Int): DataFrame = {
    require(sources.nonEmpty && sources.distinct.size == sources.size)
    require(maxHop >= 1 && maxHop <= 16, "maxHop is unrolled; keep it small")
    val spark = edges.sparkSession
    import spark.implicits._
    // pre-partitioned + sorted on `u`: BOTH passes probe es by u (forward
    // expansion and the backward dependency join), so one clustering pays
    // for 2·maxHop joins — the Scc/Bfs esBySrc discipline (r15).
    val es = edges.select(col("src").as("u"), col("dst").as("v"))
      .distinct()
      .repartition(col("u")).sortWithinPartitions("u")
      .localCheckpoint(true)

    // FORWARD: level-synchronous BFS fused with σ path counting.
    var frontier = sources.map(s => (s, s, 1L)).toDF("s", "node", "sigma")
      .localCheckpoint(true)
    // visited stays a LAZY union of the already-checkpointed per-level
    // deltas (the Bfs discipline) — re-checkpointing the growing set
    // every level would rewrite O(levels · |V|) state for nothing.
    var visited = frontier.select("s", "node")
    var levels = List(frontier.withColumn("dist", lit(0)))
    for (d <- 1 to maxHop) {
      frontier = frontier.select(col("s"), col("node").as("u"), col("sigma"))
        .join(es, Seq("u"))
        .select(col("s"), col("v").as("node"), col("sigma"))
        .join(visited, Seq("s", "node"), "left_anti")
        .groupBy("s", "node").agg(sum("sigma").as("sigma"))
        .localCheckpoint(true)
      visited = visited.union(frontier.select("s", "node"))
      levels ::= frontier.withColumn("dist", lit(d))
    }
    // levels was built deepest-first; index by dist for the backward walk
    val lev: Array[DataFrame] = levels.reverse.toArray

    // BACKWARD: δ = 0 at the radius; each earlier level accumulates from
    // its successors one level deeper. Per-(s, v) the terms fold in
    // successor-node order (sort_array + aggregate), so the IEEE
    // rounding sequence is fixed and replayable at any out-degree.
    var delta = lev(maxHop).select(col("s"), col("node"))
      .withColumn("delta", lit(0.0)).localCheckpoint(true)
    var acc = lev(maxHop)
      .join(delta, Seq("s", "node"))
      .select(col("s"), col("node"), col("dist"), col("sigma"), col("delta"))
    for (d <- (maxHop - 1) to 0 by -1) {
      val cur = lev(d) // (s, node, sigma, dist)
      val succ = lev(d + 1).join(delta, Seq("s", "node"))
        .select(col("s"), col("node").as("v"),
          col("sigma").as("sig_w"), col("delta").as("del_w"))
      val contrib = cur
        .select(col("s"), col("node").as("u"), col("sigma").as("sig_v"))
        .join(es, Seq("u"))
        .join(succ, Seq("s", "v"))
        .select(col("s"), col("u").as("node"), col("v"),
          (col("sig_v").cast("double") / col("sig_w").cast("double")
            * (lit(1.0) + col("del_w"))).as("t"))
        .groupBy("s", "node")
        .agg(aggregate(
          sort_array(collect_list(struct(col("v"), col("t")))),
          lit(0.0),
          (acc, x) => acc + x.getField("t")).as("dsum"))
      delta = cur.select("s", "node")
        .join(contrib, Seq("s", "node"), "left")
        .select(col("s"), col("node"),
          coalesce(col("dsum"), lit(0.0)).as("delta"))
        .localCheckpoint(true)
      acc = acc.union(cur.join(delta, Seq("s", "node"))
        .select(col("s"), col("node"), col("dist"), col("sigma"), col("delta")))
    }
    acc.where(col("node") =!= col("s"))
      .join(nodes.select("node"), Seq("node"), "left_semi")
      .select(col("s"), col("node"), col("dist").cast("long").as("dist"),
        col("sigma"), col("delta"))
  }
}
