package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Distinct, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the reference's signature anti-pattern: aggregation
  * written as `sum(x) OVER (PARTITION BY keys)` + `.distinct()`
  * (`/root/reference/src/transform/transform.py:123-136`, SURVEY §2.4/§4).
  * That shape shuffles EVERY fact row through the window exchange and then
  * hash-aggregates the full projection width for the distinct; the equivalent
  * `GROUP BY` aggregates map-side first and shuffles |groups| rows.
  *
  * The rewrite fires only when it is provably identity-preserving:
  *  - every window function is an unordered Sum/Min/Max over the whole
  *    partition (no ORDER BY, default unbounded frame, no DISTINCT/filter);
  *  - the projected non-window expressions are EXACTLY the window partition
  *    keys (two-way containment). A projection carrying any other column —
  *    even one functionally dependent on the keys, like the reference's
  *    `full_name` — is left untouched, because dependency isn't provable from
  *    the plan.
  *
  * Output attribute ids are preserved, so parent operators are unaffected.
  * This is extension-ladder tier (c): a `Rule[LogicalPlan]` registered through
  * [[GraftExtensions]] (`SparkSessionExtensions.injectOptimizerRule`).
  */
object WindowDistinctToAggregate extends Rule[LogicalPlan] {

  private def asCompleteAgg(we: WindowExpression): Option[AggregateExpression] = we match {
    // the analyzed window function arrives wrapped in an AggregateExpression;
    // an unordered window's frame resolves to unbounded/unbounded (accept the
    // row and range spellings equally)
    case WindowExpression(
        ae: AggregateExpression,
        WindowSpecDefinition(_, Nil,
          SpecifiedWindowFrame(RowFrame | RangeFrame, UnboundedPreceding, UnboundedFollowing)))
        if !ae.isDistinct && ae.filter.isEmpty &&
          (ae.aggregateFunction match {
            case _: Sum | _: Min | _: Max => true
            case _ => false
          }) =>
      Some(ae.copy(mode = Complete))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // pre-optimizer spelling
    case Distinct(Project(projList, w: Window)) =>
      rewrite(projList, w).getOrElse(Distinct(Project(projList, w)))
    // post-ReplaceDistinctWithAggregate spelling: a distinct is an Aggregate
    // grouping on (and projecting exactly) its child's columns
    case a @ Aggregate(g, ae, Project(projList, w: Window), _)
        if ae.forall(_.isInstanceOf[Attribute]) && g.length == ae.length &&
          g.zip(ae).forall { case (ge, ael) => ge.semanticEquals(ael) } =>
      rewrite(projList, w).getOrElse(a)
  }

  private def rewrite(projList: Seq[NamedExpression], w: Window): Option[LogicalPlan] = {
    // every window expression must be a rewritable whole-partition aggregate
    val winAggs: Map[ExprId, AggregateExpression] = w.windowExpressions.flatMap {
      case a @ Alias(we: WindowExpression, _) => asCompleteAgg(we).map(a.exprId -> _)
      case _ => return None
    }.toMap
    if (w.orderSpec.nonEmpty) return None

    val (winProjs, keyProjs) = projList.partition {
      case ar: AttributeReference => winAggs.contains(ar.exprId)
      case _ => false
    }
    if (winProjs.isEmpty) return None

    // two-way containment: projected keys == window partition keys. The
    // partition must be NON-EMPTY: a global window over an empty input emits
    // zero rows, a global aggregate emits one — not identity-preserving.
    val partExprs = w.partitionSpec
    if (partExprs.isEmpty) return None
    val keyExprs: Seq[Expression] = keyProjs.map {
      case a: Alias => a.child
      case e => e
    }
    val sameSet =
      keyExprs.forall(k => partExprs.exists(_.semanticEquals(k))) &&
      partExprs.forall(p => keyExprs.exists(_.semanticEquals(p)))
    if (!sameSet) return None

    val aggExprs: Seq[NamedExpression] = projList.map {
      case ar: AttributeReference if winAggs.contains(ar.exprId) =>
        Alias(winAggs(ar.exprId), ar.name)(exprId = ar.exprId)
      case other => other
    }
    Some(Aggregate(keyExprs, aggExprs, w.child))
  }
}

/** Session extension wiring: `SessionFactory` installs this, so every graft
  * session optimizes the window+distinct shape automatically.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => WindowDistinctToAggregate)
}
