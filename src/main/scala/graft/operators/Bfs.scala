package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-source BFS hop distances over a directed edge table — the
  * reachability/shortest-hop member of the graph tier (undirected CC,
  * incremental CC, triangles, TextRank, SCC). Frontier-form BSP: each
  * round expands only from the nodes discovered LAST round, anti-joined
  * against the accumulated visited set — per-round work tracks the
  * frontier's edges, not the visited set, the same discipline as Scc's
  * backward pass.
  *
  * DOUBLE-STEPPED like both Scc fixpoints (measured finding there: on
  * diameter-many metadata-scale shuffles the per-round fixed overhead —
  * materialization, count job, scheduling — dominates, so two hops per
  * checkpoint nearly halves wall time). Correctness of the two-hop
  * labels: every node at true distance d+2 has a predecessor at exactly
  * d+1, which is in this round's hop-1 delta (new nodes only — expanding
  * hop 2 from already-visited hop-1 hits would mislabel, so hop 1 is
  * anti-joined BEFORE the second expansion).
  *
  * VISITED is ONE checkpointed frame kept HASH-PARTITIONED AND SORTED on
  * the anti-join key (r15 measured finding, reversing the r14 lazy-union
  * form): LogicalRDD preserves outputPartitioning/outputOrdering through
  * localCheckpoint, so both per-round anti-joins see a clustered, sorted
  * right side and shuffle/sort NOTHING — the lazy union of deltas
  * re-shuffled the whole visited set TWICE per round (every anti-join),
  * which is why late rounds got slower as visited grew (0.45 → 1.0 s/hop
  * at sf1). One repartition+sort+checkpoint of visited per round replaces
  * the two anti-join shuffles: 35.2/29.3 → 20.8/19.8 s at sf1 and
  * 85.9/79.3 → 60.0/55.3 s at sf10 on the 4-source 'scc-' digraph loop
  * (cold/warm, exclusive runs). Rounds no longer slow down as visited
  * grows; the remaining floor is the per-hop edge-table probe scan.
  */
object Bfs {

  /** MULTI-source BFS: hop distances from every source in ONE BSP loop —
    * the state is (s, node, dist) pairs and every join/anti-join keys on
    * (s, node), so k sources cost one loop whose rounds track the UNION
    * of the k frontiers, not k separate loops of diameter-many fixed
    * round overheads each (the closeness-centrality shape: k traversals
    * amortized into one). Same double-step discipline as `distances`.
    *
    * @param sources distinct BFS roots (must be in `nodes`)
    * @return (s, node, dist): distance from source s to node, reachable
    *   pairs only */
  def distancesMulti(nodes: DataFrame, edges: DataFrame, sources: Seq[Long],
      maxIters: Int = 40): DataFrame = {
    require(sources.nonEmpty && sources.distinct.size == sources.size)
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.select(col("src").as("u"), col("dst").as("v"))
      .distinct().localCheckpoint(true)
    // partitioned+sorted on the anti-join key and kept that way every
    // round — see the class doc's r15 measurement
    var visited = sources.map(s => (s, s, 0L)).toDF("s", "node", "dist")
      .repartition(col("s"), col("node"))
      .sortWithinPartitions("s", "node")
      .localCheckpoint(true)
    var frontier = visited.select("s", "node")
    var d = 0L
    var frontierCount = sources.size.toLong
    var iter = 0
    def hop(f: DataFrame): DataFrame =
      es.join(f.select(col("s"), col("node").as("u")), Seq("u"))
        .select(col("s"), col("v").as("node")).distinct()
    while (frontierCount > 0) {
      val h1 = hop(frontier)
        .join(visited.select("s", "node"), Seq("s", "node"), "left_anti")
        .localCheckpoint(true)
      val h2 = hop(h1)
        .join(visited.select("s", "node"), Seq("s", "node"), "left_anti")
        .join(h1, Seq("s", "node"), "left_anti")
        .localCheckpoint(true)
      val grown = h1.withColumn("dist", lit(d + 1L))
        .union(h2.withColumn("dist", lit(d + 2L)))
      visited = visited.union(grown)
        .repartition(col("s"), col("node"))
        .sortWithinPartitions("s", "node")
        .localCheckpoint(true)
      frontier = h2
      frontierCount = h2.count()
      d += 2
      iter += 1
      require(iter < maxIters, s"multi-BFS did not converge in $maxIters rounds")
    }
    visited.join(nodes.select("node"), Seq("node"), "left_semi")
      .select("s", "node", "dist")
  }

  /** @param nodes (node: long) — vertex set; discovered ids outside it are
    *   dropped (hash-derived edge tables may point at phantom ids)
    * @param edges (src, dst: long) — directed edges
    * @param source BFS root
    * @return (node, dist: long) for REACHABLE nodes only, dist = hop count */
  def distances(
      nodes: DataFrame,
      edges: DataFrame,
      source: Long,
      maxIters: Int = 40): DataFrame = {
    val spark = edges.sparkSession
    val es = edges.select(col("src"), col("dst")).distinct().localCheckpoint(true)
    var visited = spark.range(1)
      .select(lit(source).as("node"), lit(0L).as("dist"))
      .repartition(col("node")).sortWithinPartitions("node")
      .localCheckpoint(true)
    var frontier = visited.select("node")
    var d = 0L
    var frontierCount = 1L
    var iter = 0
    // one hop: distinct successors of f (labels applied by the caller)
    def hop(f: DataFrame): DataFrame =
      es.join(f.select(col("node").as("src")), Seq("src"))
        .select(col("dst").as("node")).distinct()
    while (frontierCount > 0) {
      val h1 = hop(frontier)
        .join(visited.select("node"), Seq("node"), "left_anti")
        .localCheckpoint(true)
      val h2 = hop(h1)
        .join(visited.select("node"), Seq("node"), "left_anti")
        .join(h1, Seq("node"), "left_anti")
        .localCheckpoint(true)
      val grown = h1.withColumn("dist", lit(d + 1L))
        .union(h2.withColumn("dist", lit(d + 2L)))
      visited = visited.union(grown)
        .repartition(col("node")).sortWithinPartitions("node")
        .localCheckpoint(true)
      frontier = h2
      frontierCount = h2.count()
      d += 2
      iter += 1
      require(iter < maxIters, s"BFS did not converge in $maxIters rounds")
    }
    visited.join(nodes.select("node"), Seq("node"), "left_semi")
  }
}
