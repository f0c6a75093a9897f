package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}

/** Cross-cutting plan assertions over EVERY driver query: defects that are
  * invisible at test scale but fatal at 100 TB must be structurally absent,
  * not just currently fast. */
class PlanHygieneSpec extends AnyFunSuite {
  import TestSpark._

  test("no query plans an unpartitioned Window (single-partition global sort)") {
    // A Window with an empty partitionSpec pulls the whole input through ONE
    // task — the r3 rankBoundaries defect. Checked on the optimized logical
    // plan so AQE re-planning can't hide it.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, Sf).queryExecution.optimizedPlan
      plan.collect {
        case w: LogicalWindow if w.partitionSpec.isEmpty => name
      }
    }
    assert(offenders.isEmpty,
      s"unpartitioned Window in: ${offenders.distinct.mkString(", ")}")
  }

  test("no query plans a cartesian product or broadcast nested loop join") {
    // Deliberate broadcast nested loops: ann_topk (tiny broadcast query
    // set scored against every corpus row map-side; its scale story is the
    // bounded top-k sink, asserted in AnnSpec), ann_lsh/ann_ivf (their
    // self-verification rows judge the approximate tier against the same
    // brute-force exact top-k inside the query, plus a one-row denominator
    // broadcast) and text_tfidf (a ONE-ROW corpus-count broadcast attached
    // to every term — O(n) map-side, the cheapest way to ship a scalar).
    // sketch_heavy_hitters broadcasts a ONE-ROW aggregate (the count-min
    // sketch bytes) the same way: the single-row side makes the nested
    // loop O(n) map-side probes. (dedup_incremental used to be here for
    // its single broadcast Bloom; the sharded filter table is now probed
    // by a keyed equi-join on bucket, so it must NOT plan a nested loop.)
    // Everything else must be keyed joins. CartesianProduct is banned
    // everywhere. Known blind spot: queries that EXECUTE work inside their
    // builder (cdc_handoff's foreachBatch merges, dedup_clusters'
    // propagation rounds) only surface their trailing read plan here — the
    // interior join shapes are covered by their own specs
    // (SnapshotHandoffSpec, ConnectedComponentsSpec) rather than this gate.
    // mixture_rebalance broadcasts a ONE-ROW (M, W) scalar aggregate onto
    // the |sources|-row rate table — same O(tiny) map-side shape.
    // select_quality_top broadcasts the ONE-ROW global quantile cut the
    // whole corpus compares against map-side. text_lm_score broadcasts two
    // ONE-ROW scalars the same way (vocab size V onto the bigram stream,
    // the global (tot_sum, tot_n) mean onto the per-doc scores).
    // layout_zorder broadcasts the ONE-ROW (k_min, k_max1) key bounds
    // onto the layout assignment — the same O(tiny) map-side shape.
    // sample_importance broadcasts the ONE-ROW (Σscore, n) corpus mean
    // onto the per-doc scores for the exact cross-multiplied keep gate —
    // the text_lm_score shape.
    // sketch_join_size broadcasts two ONE-ROW sketch aggregates onto the
    // one-row exact-count frame (the sketch_heavy_hitters shape, twice).
    // ann_pq broadcasts the 10-row query frame (ADC tables) onto the code
    // stream — the ann_topk broadcast-queries shape.
    // profile_drift broadcasts the ONE-ROW (N_base, N_new) totals onto the
    // O(buckets) histogram frame — the select_quality_top shape.
    // events_gapfill broadcasts the ONE-ROW (d0, d1) calendar bounds onto
    // the distinct-type frame to build the metadata-scale calendar —
    // the mixture_rebalance shape.
    // join_hybrid_skew broadcasts the ONE-ROW (total, |keys|) census onto
    // the metadata-scale per-key counts frame (the relative hot-key
    // threshold), and the one-row n_hot_keys claim onto the agg result.
    val nljAllowed = Set("ann_topk", "ann_lsh", "ann_ivf", "text_tfidf",
      "sketch_heavy_hitters", "mixture_rebalance", "select_quality_top",
      "text_lm_score", "layout_zorder", "sample_importance",
      "sketch_join_size", "ann_pq", "profile_drift", "events_gapfill",
      "join_hybrid_skew", "layout_hilbert",
      // mixture_temperature reuses Mixture.rates' ONE-ROW (M, W) scalar
      // broadcast — the mixture_rebalance shape with sqrt-grid weights
      "mixture_temperature",
      // q22_inactive_rich broadcasts the ONE-ROW (n_pos, sum_pos)
      // positive-balance aggregate onto the customer scan — the
      // decorrelated uncorrelated-scalar-subquery shape
      "q22_inactive_rich",
      // join_spatial_grid broadcasts the ONE-ROW point count used for the
      // density-normalizing coordinate side — the mixture_rebalance shape
      // (join_spatial_polygon reuses the same points() one-row broadcast;
      // its polygon frame itself is checkpointed and joins by cell key)
      "join_spatial_grid", "join_spatial_knn", "join_spatial_polygon",
      // join_bloom_prefilter broadcasts the ONE-ROW serialized Bloom
      // filter onto the fact scan — the runtime-filter pushdown itself
      "join_bloom_prefilter",
      // ann_ivf_pq's in-query brute-force REFERENCE (annVerification's
      // exact side) is the ann_topk broadcast-queries nested loop; the
      // IVF-PQ pipeline itself is keyed joins on list_id/nid/qid
      "ann_ivf_pq",
      // ml_kmeans broadcasts the ONE-ROW packed centroid array (k=4
      // structs) onto the point scan each Lloyd iteration — the
      // production broadcast-centroids shape; assignment is map-side
      // arithmetic, the corpus never shuffles
      "ml_kmeans",
      // skyline_pareto's bucket prefix-min is a triangular self-join of
      // the O(buckets) minima frame (~96 rows each side, broadcast) —
      // metadata-scale by construction; the corpus side joins on the
      // equi bucket key only
      "skyline_pareto",
      // graph_condensation's edge derivation broadcasts the ONE-ROW node
      // count (the graph_scc/join_spatial_grid density-normalizing
      // shape); graph_scc itself doesn't surface here because its edges
      // frame is consumed through Scc's eager checkpoints, while the
      // condensation reuses the raw edge frame in its trailing
      // condensed-edge join
      "graph_condensation",
      // q11_important_parts broadcasts the ONE-ROW global inventory total
      // onto the metadata-scale per-part aggregate — the q22 decorrelated
      // uncorrelated-scalar shape
      "q11_important_parts",
      // text_collocations broadcasts the ONE-ROW corpus bigram total onto
      // the per-pair frame for the lift denominator — the same shape
      "text_collocations",
      // graph_linkpred derives its edge set with the graph-lane ONE-ROW
      // node-count broadcast (the graph_condensation shape; bfs/scc hide
      // the same construction behind their eager checkpoints)
      "graph_linkpred",
      // profile_benford broadcasts TWO one-row scalars (the corpus count
      // and the chi-square total) onto the 9-row digit frame — the
      // q11_important_parts shape, twice
      "profile_benford",
      // graph_modularity broadcasts the ONE-ROW edge count m into the
      // gain computation and the ONE-ROW (q_num, q_den) quality scalar
      // onto the size census — the graph-lane scalar shape
      "graph_modularity",
      // graph_louvain2 reuses the same ONE-ROW m/q scalar broadcasts at
      // both levels (sweep, weighted sweep, q1, q2)
      "graph_louvain2",
      // join_spatial_polygon_concave reuses points()/poly's ONE-ROW count
      // broadcast — the join_spatial_polygon shape; candidates and the
      // parity fold ride the (cx, cy) equi-join
      "join_spatial_polygon_concave",
      // ml_tree's level-0 split application folds the constant root node
      // id out of the equi-key, leaving a ONE-ROW IdentityBroadcast left
      // join (best0 is exactly one row); levels 1+ plan as
      // BroadcastHashJoin on the node key
      "ml_tree",
      // text_kneser_ney broadcasts the ONE-ROW bigram-type total N onto
      // the bigram frame — the text_collocations shape
      "text_kneser_ney",
      // ml_forest's level-0 split application folds the constant root id
      // out of the (tree, node) equi-key, leaving a ≤3-row broadcast on
      // the tree key — the ml_tree shape with the tree dimension
      "ml_forest",
      // ml_forest_predict routes via the same level-0 constant-root
      // broadcast (training AND scoring hops)
      "ml_forest_predict",
      // profile_skew broadcasts the ONE-ROW global concentration scalars
      // (gini_num/den, HHI, totals) onto the top-10 key frame
      "profile_skew",
      // ml_gbt broadcasts the ONE-ROW fitted stump (feature, bucket,
      // v_left, v_right) onto the residual chain each round — the
      // ml_kmeans broadcast-model shape; the update is map-side CASE
      "ml_gbt",
      // text_bm25 broadcasts the ONE-ROW (S, D) corpus totals onto the
      // query-term postings — the text_tfidf one-row-scalar shape
      "text_bm25",
      // ann_rrf runs TWO brute-force reference scans (exact + quantized),
      // each the ann_topk broadcast-queries nested loop; fusion itself is
      // a keyed (qid, nid) join on the O(queries × 20) rank lists
      "ann_rrf",
      // ml_auc / ml_confusion / ml_cv broadcast the ONE-ROW corpus
      // (count, positives) totals onto the ≤16-row leaf-class frame for
      // the exact cross-multiplied lift vote — the profile_drift
      // one-row-scalar shape on metadata; routing itself is the
      // ml_forest_predict keyed broadcast hops
      "ml_auc", "ml_confusion", "ml_cv",
      // ml_lift reuses the same one-row lift-vote totals broadcast
      "ml_lift",
      // ml_target_encode broadcasts the ONE-ROW global (N, ΣY) prior
      // onto the 24-row category frame for the exact folded-rational
      // smoothed encoding — the profile_drift one-row-scalar shape
      "ml_target_encode",
      // graph_assortativity derives its edge set with the graph-lane
      // ONE-ROW node-count broadcast (the graph_condensation shape —
      // its raw edge frame feeds the degree joins directly, so the
      // construction isn't hidden behind a checkpoint)
      "graph_assortativity",
      // graph_eccentricity broadcasts the ONE-ROW (radius_ub,
      // diameter_lb) bounds aggregate onto the 4-row per-source census —
      // the graph-lane scalar shape (its edge derivation hides behind
      // distancesMulti's eager checkpoints like bfs/scc)
      "graph_eccentricity",
      // ml_pr_auc / ml_calibration ride the shared liftVotes pipeline —
      // the same ONE-ROW (count, positives) totals broadcast onto the
      // ≤16-row leaf-class frame as ml_auc/ml_confusion/ml_lift
      "ml_pr_auc", "ml_calibration",
      // orders_pareto broadcasts the ONE-ROW total-revenue scalar onto
      // the per-part cumulative frame for the exact cross-multiplied
      // class cuts — the select_quality_top one-row-cut shape
      "orders_pareto",
      // sample_balanced broadcasts the ONE-ROW minority-count target
      // onto the (class, bucket) histogram metadata frame — the
      // profile_drift one-row-scalar shape
      "sample_balanced",
      // graph_linkpred_ra derives its edge set with the graph-lane
      // ONE-ROW node-count broadcast (the graph_linkpred shape)
      "graph_linkpred_ra",
      // audit_tcloseness broadcasts the ≤6-row bucket DOMAIN (every class
      // needs every ordered bucket for the cumulative EMD walk) and the
      // ONE-ROW (N, m) totals onto the ~125-row class frame — both
      // bounded-metadata broadcasts, never corpus-sized
      "audit_tcloseness",
      // graph_hits derives its edge set with the graph-lane ONE-ROW
      // node-count broadcast (the graph_pagerank shape)
      "graph_hits",
      // sample_pps broadcasts the ONE-ROW total-weight scalar onto the
      // cumulative frame for the integer tick-crossing test
      "sample_pps",
      // orders_itemsim broadcasts the ONE-ROW order-count scalar onto
      // the bounded pair frame for the lift denominator
      "orders_itemsim",
      // profile_outliers broadcasts the ONE-ROW totals and ONE-ROW
      // q1/q3 scalars onto the per-column scan for the fence counts
      "profile_outliers",
      // ann_filtered runs two brute-force passes with the same tiny
      // broadcast query set as ann_topk (deliberate BNLJ, map-side)
      "ann_filtered",
      // ml_knn_classify scores with the same broadcast query set
      "ml_knn_classify",
      // graph_reciprocity derives its edge set with the graph-lane
      // ONE-ROW node-count broadcast (the graph_pagerank shape)
      "graph_reciprocity")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val s = fn(spark, Sf).queryExecution.executedPlan.toString
      if (s.contains("CartesianProduct") ||
        (s.contains("BroadcastNestedLoopJoin") && !nljAllowed(name)))
        Some(name)
      else None
    }
    assert(offenders.isEmpty, s"cross-product join in: ${offenders.mkString(", ")}")
  }

  // This spec CONSTRUCTS every query without executing it, which persists
  // the LSH sketch intermediates whose release listener only fires on a
  // consuming action. Drop them so later suites can assert on global cache
  // state.
  override def withFixture(test: NoArgTest) = {
    val out = super.withFixture(test)
    spark.sharedState.cacheManager.clearCache()
    out
  }
}
