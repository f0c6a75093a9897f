package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the "top-one row per key" window idiom
  *
  * {{{ df.withColumn("rn", row_number().over(partitionBy(k).orderBy(o)))
  *      .where($"rn" === 1) }}}
  *
  * into a single hash aggregate `min_by(struct(*), orderKey)` (ascending
  * order; `max_by` for descending). The window form sorts every partition's
  * full data (exchange + sort); the aggregate form is one exchange with
  * map-side partial combine and NO sort — at 100 TB of change events the
  * latest-state compaction this idiom implements (writers/transfer
  * semantics, `cdc_latest_state`, `Dedup.exactLatest`) drops its largest
  * cost. This is the Catalyst `Rule[LogicalPlan]` tier of the extension
  * surface (registered by [[graft.GraftExtensions]] via
  * `injectOptimizerRule`), complementing the native-`Expression` tier.
  *
  * Correctness envelope (the rule bails out otherwise):
  *  - exactly one window expression: `row_number()` with the
  *    (RowFrame, UnboundedPreceding, CurrentRow) frame;
  *  - the filter keeps exactly rank 1 (`rn = 1` conjunct; other conjuncts
  *    are preserved above the rewritten aggregate);
  *  - partition keys are plain attributes; order keys are deterministic;
  *  - uniform sort direction with DEFAULT null ordering. Catalyst's struct
  *    ordering places a null field before non-null, which is exactly
  *    asc/NullsFirst — and its reverse is desc/NullsLast — so `min_by` /
  *    `max_by` over the order-key struct reproduce the window's null
  *    semantics bit-for-bit.
  *  - the whole surviving ROW is carried as ONE struct through a single
  *    min_by/max_by, so tied order keys yield SOME complete row (same
  *    contract as row_number under a non-total order), never columns
  *    spliced from different rows.
  */
object TopOneWindowToMinMaxBy extends Rule[LogicalPlan] {

  /** rn attribute + the window node internals, when the shape matches. */
  private def topOneWindow(w: Window): Option[(Attribute, Seq[SortOrder], Boolean)] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(_, orderSpec,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _))
          if orderSpec.nonEmpty && orderSpec.forall(_.child.deterministic) =>
        val dirs = orderSpec.map(so => (so.direction, so.nullOrdering)).distinct
        dirs match {
          case Seq((Ascending, NullsFirst)) => Some((a.toAttribute, orderSpec, true))
          case Seq((Descending, NullsLast)) => Some((a.toAttribute, orderSpec, false))
          case _ => None
        }
      case _ => None
    }

  private def isOne(e: Expression): Boolean = e match {
    case Literal(1, IntegerType) => true
    case _ => false
  }

  /** Split `cond` into (rank-1 conjunct found?, remaining conjuncts). */
  private def splitRankOne(cond: Expression, rn: Attribute): (Boolean, Seq[Expression]) = {
    val conjuncts = splitConjunctivePredicates(cond)
    val (rankOne, rest) = conjuncts.partition {
      case EqualTo(a: Attribute, l) => a.semanticEquals(rn) && isOne(l)
      case EqualTo(l, a: Attribute) => a.semanticEquals(rn) && isOne(l)
      case _ => false
    }
    (rankOne.nonEmpty && rest.forall(e => !e.references.contains(rn)), rest)
  }

  private def splitConjunctivePredicates(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
    case other => Seq(other)
  }

  private def rewrite(w: Window, rn: Attribute, orderSpec: Seq[SortOrder],
      asc: Boolean): Option[Aggregate] = {
    // empty partitionSpec: a global aggregate over EMPTY input emits one
    // all-null row where the window form emits zero rows — bail (that shape
    // is also the unpartitioned-window scale-killer PlanHygieneSpec bans)
    if (w.partitionSpec.isEmpty) return None
    val partitionAttrs = w.partitionSpec.map {
      case a: Attribute => a
      case _ => return None
    }
    val groupingSet = AttributeSet(partitionAttrs)
    // ALWAYS a struct key, even for one order column: min_by/max_by SKIP
    // null ordering keys (and return null for an all-null group), which
    // diverges from row_number's NullsFirst/NullsLast ranking — a struct is
    // never null and its field ordering places null first, matching the
    // window's default null ordering exactly
    val key = CreateStruct(orderSpec.map(_.child))
    val rowStruct = CreateStruct(w.child.output)
    val pick = AggregateExpression(
      if (asc) MinBy(rowStruct, key) else MaxBy(rowStruct, key),
      Complete, isDistinct = false)

    val outputs: Seq[NamedExpression] = w.child.output.zipWithIndex.map {
      case (a, i) =>
        if (groupingSet.contains(a)) a
        else Alias(GetStructField(pick, i, Some(a.name)), a.name)(exprId = a.exprId)
    } :+ Alias(Literal(1), rn.name)(exprId = rn.exprId)
    Some(Aggregate(partitionAttrs, outputs, w.child))
  }

  private def rebuildFilter(rest: Seq[Expression], child: LogicalPlan): LogicalPlan =
    rest.reduceOption(And).map(Filter(_, child)).getOrElse(child)

  private def tryRewrite(cond: Expression, w: Window,
      wrap: LogicalPlan => LogicalPlan): Option[LogicalPlan] =
    topOneWindow(w).flatMap { case (rn, orderSpec, asc) =>
      val (matched, rest) = splitRankOne(cond, rn)
      if (matched)
        rewrite(w, rn, orderSpec, asc).map(agg => rebuildFilter(rest, wrap(agg)))
      else None
    }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      tryRewrite(cond, w, identity).getOrElse(f)

    case f @ Filter(cond, Project(projList, w: Window))
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      tryRewrite(cond, w, Project(projList, _)).getOrElse(f)
  }
}
