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

  /** Average precision (area under the precision-recall curve by the
    * step-interpolation every ranking library reports) over the same
    * fixed-domain contingency cells. Walking thresholds from the highest
    * score down, AP = Σ_cuts (Δtp/n₁)·(tp/flagged) — each term is two
    * exact-integer IEEE divisions and one multiply, and the ≤|domain|
    * terms fold in a FIXED descending-cut order (left-associated, the
    * events_stationary discipline) so the double hash-replays
    * cross-engine. Same one-pass / no-rank / no-window 100 TB shape as
    * fromBucketScores; PR-AUC is the metric that stays informative when
    * the positive class is rare — exactly the imbalanced-corpus regime
    * where ROC-AUC flatters (Davis & Goadrich 2006). An empty cut
    * (flagged = 0 ⇒ Δtp = 0) contributes an exact 0 instead of a 0/0
    * NULL. */
  def averagePrecision(scores: DataFrame, scoreCol: String, labelCol: String,
      domain: Seq[Long]): DataFrame = {
    require(domain.nonEmpty && domain == domain.sorted && domain.distinct == domain)
    def cell(v: Long, lab: Long): Column =
      sum(when(col(scoreCol) === v && col(labelCol) === lab, 1L).otherwise(0L))
    val aggs = domain.flatMap(v =>
      Seq(cell(v, 1L).as(s"p$v"), cell(v, 0L).as(s"q$v")))
    val cells = scores.agg(aggs.head, aggs.tail: _*)
    val n1 = domain.map(v => col(s"p$v")).reduce(_ + _)
    val n0 = domain.map(v => col(s"q$v")).reduce(_ + _)
    val terms = domain.sorted.reverse.map { cut =>
      val tp = domain.filter(_ >= cut).map(v => col(s"p$v")).reduce(_ + _)
      val flagged = domain.filter(_ >= cut)
        .flatMap(v => Seq(col(s"p$v"), col(s"q$v"))).reduce(_ + _)
      val dtp = col(s"p$cut")
      when(flagged === 0L, lit(0.0)).otherwise(
        (dtp.cast("double") / n1.cast("double"))
          * (tp.cast("double") / flagged.cast("double")))
    }
    val ap = terms.reduce(_ + _)
    cells.select(n1.as("n_pos"), n0.as("n_neg"),
      (n1.cast("double") / (n1 + n0).cast("double")).as("base_rate"),
      ap.as("ap"))
  }

  /** Calibration / reliability table over the same cells: one row per
    * score level v — support n, positives n_pos, the model's implied
    * probability v/max (exact-int IEEE division), the empirical rate
    * n_pos/n (NULL on an unattained level), and the signed gap — plus
    * the corpus Brier score Σ[p_v·(1−v/m)² + q_v·(v/m)²]/N folded over
    * the fixed domain in ascending order (left-associated; every term a
    * fixed IEEE sequence on exact ints, so the double hash-replays).
    * A model can have good AUC and terrible calibration — this is the
    * lane that tells them apart, at the same one-pass corpus cost. */
  def calibrationTable(scores: DataFrame, scoreCol: String, labelCol: String,
      domain: Seq[Long]): DataFrame = {
    require(domain.nonEmpty && domain == domain.sorted && domain.distinct == domain)
    val m = domain.max
    def cell(v: Long, lab: Long): Column =
      sum(when(col(scoreCol) === v && col(labelCol) === lab, 1L).otherwise(0L))
    val aggs = domain.flatMap(v =>
      Seq(cell(v, 1L).as(s"p$v"), cell(v, 0L).as(s"q$v")))
    val cells = scores.agg(aggs.head, aggs.tail: _*)
    val n = domain.flatMap(v => Seq(col(s"p$v"), col(s"q$v"))).reduce(_ + _)
    val brierNum = domain.map { v =>
      val pv = lit(v).cast("double") / lit(m).cast("double")
      col(s"p$v").cast("double") * ((lit(1.0) - pv) * (lit(1.0) - pv)) +
        col(s"q$v").cast("double") * (pv * pv)
    }.reduce(_ + _)
    val rows = domain.map { v =>
      val nv = col(s"p$v") + col(s"q$v")
      struct(lit(v).as("score"), nv.as("n"), col(s"p$v").as("n_pos"),
        (lit(v).cast("double") / lit(m).cast("double")).as("pred_p"),
        when(nv === 0L, lit(null).cast("double"))
          .otherwise(col(s"p$v").cast("double") / nv.cast("double")).as("emp_p"))
    }
    cells.select(explode(array(rows: _*)).as("r"),
        (brierNum / n.cast("double")).as("brier"))
      .select(col("r.score"), col("r.n"), col("r.n_pos"), col("r.pred_p"),
        col("r.emp_p"), (col("r.emp_p") - col("r.pred_p")).as("gap"),
        col("brier"))
      .orderBy("score")
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
