package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact ROC-AUC over a FIXED small score domain — the evaluation member
  * of the ML tier (train: DecisionTree/Boosting; serve: applySplits;
  * evaluate: this). Uses the Mann-Whitney identity
  * AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻), assembled from the
  * per-(score, label) contingency cells so nothing ever ranks or sorts:
  *
  *   u2  = 2·Σ_{i>j} n1ᵢ·n0ⱼ + Σᵢ n1ᵢ·n0ᵢ     (doubled U — ties stay integer)
  *   auc = u2 / (2·n1·n0)                       (the ONE IEEE division)
  *
  * The pair terms are expanded STATICALLY over the declared domain, so the
  * whole computation is ONE corpus pass of conditional sums into
  * 2·|domain| cells followed by scalar arithmetic on the single result
  * row — no window (a global rank would single-task the corpus), no join,
  * map-side partial aggregation all the way. This is the 100 TB shape:
  * discrete classifier scores (votes, calibrated buckets) have tiny fixed
  * domains, and the O(|domain|²) term expansion is free at any corpus
  * size.
  *
  * Reference behavioral anchor: artie-labs/reader has no ML evaluation;
  * this lane completes the train→serve→evaluate loop of the forest tier.
  *
  * @param scores one row per scored example
  * @param scoreCol integer score column; every value MUST lie in `domain`
  *                 (out-of-domain rows would silently vanish from both
  *                 margins — the caller's score construction must bound it)
  * @param labelCol 0/1 long label column
  * @param domain   the closed set of attainable scores, ascending
  * @return one row: (n_pos, n_neg, u2, auc) — all exact BIGINT except the
  *         final division */
object Auc {

  def fromBucketScores(scores: DataFrame, scoreCol: String, labelCol: String,
      domain: Seq[Long]): DataFrame = {
    require(domain.nonEmpty && domain == domain.sorted && domain.distinct == domain)
    def cell(v: Long, lab: Long): Column =
      sum(when(col(scoreCol) === v && col(labelCol) === lab, 1L).otherwise(0L))
    val aggs = domain.flatMap(v =>
      Seq(cell(v, 1L).as(s"p$v"), cell(v, 0L).as(s"q$v")))
    val cells = scores.agg(aggs.head, aggs.tail: _*)
    val strict = for { i <- domain; j <- domain if i > j }
      yield lit(2L) * col(s"p$i") * col(s"q$j")
    val ties = domain.map(v => col(s"p$v") * col(s"q$v"))
    val u2 = (strict ++ ties).reduce(_ + _)
    val n1 = domain.map(v => col(s"p$v")).reduce(_ + _)
    val n0 = domain.map(v => col(s"q$v")).reduce(_ + _)
    cells.select(n1.as("n_pos"), n0.as("n_neg"), u2.as("u2"),
      (u2.cast("double") / (lit(2L) * n1 * n0).cast("double")).as("auc"))
  }

  /** Cumulative gains / lift table over the same contingency cells: one
    * row per candidate threshold `cut` ∈ domain — flag every example
    * with score ≥ cut, report flagged count, captured positives, recall
    * tp/n₁, and lift (tp/n_flagged)/(n₁/n) in its cross-multiplied
    * rational form tp·n/(n_flagged·n₁) so each metric is ONE exact-int
    * IEEE division. The cumulative sums are STATIC partial sums of the
    * cells (no window, no sort — same 100 TB shape as fromBucketScores);
    * the targeting decision "how deep to mail/crawl/label" reads
    * straight off the table. */
  def liftTable(scores: DataFrame, scoreCol: String, labelCol: String,
      domain: Seq[Long]): DataFrame = {
    require(domain.nonEmpty && domain == domain.sorted && domain.distinct == domain)
    def cell(v: Long, lab: Long): Column =
      sum(when(col(scoreCol) === v && col(labelCol) === lab, 1L).otherwise(0L))
    val aggs = domain.flatMap(v =>
      Seq(cell(v, 1L).as(s"p$v"), cell(v, 0L).as(s"q$v")))
    val cells = scores.agg(aggs.head, aggs.tail: _*)
    val n1 = domain.map(v => col(s"p$v")).reduce(_ + _)
    val n = domain.flatMap(v => Seq(col(s"p$v"), col(s"q$v"))).reduce(_ + _)
    val rows = domain.map { cut =>
      val tp = domain.filter(_ >= cut).map(v => col(s"p$v")).reduce(_ + _)
      val flagged = domain.filter(_ >= cut)
        .flatMap(v => Seq(col(s"p$v"), col(s"q$v"))).reduce(_ + _)
      // empty-slice guard: a cut above every attained score flags nothing;
      // lift is undefined there (NULL in both engines, never a 0/0 throw)
      struct(lit(cut).as("cut"), flagged.as("n_flagged"), tp.as("tp"),
        when(flagged === 0L, lit(null).cast("double"))
          .otherwise((tp * n).cast("double") / (flagged * n1).cast("double"))
          .as("lift"),
        (tp.cast("double") / n1.cast("double")).as("recall"))
    }
    cells.select(explode(array(rows: _*)).as("r"))
      .select(col("r.cut"), col("r.n_flagged"), col("r.tp"),
        col("r.lift"), col("r.recall"))
      .orderBy("cut")
  }
}
