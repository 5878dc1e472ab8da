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
  *  - every window partition key appears among the projected non-window
  *    expressions (else the distinct merges across partitions and no
  *    aggregate regrouping is equivalent).
  *
  * Two shapes, by how the projection relates to the partition keys K:
  *  - projection == K exactly: collapse to a single `Aggregate(K)` — the
  *    window disappears entirely.
  *  - projection == K ∪ E with extra dependent columns E (the reference's
  *    `full_name`, `transform.py:126`): decompose into
  *    `Aggregate(K∪E, partial-agg)` → `Window(agg-of-partials OVER K)`.
  *    Sum-of-sums / min-of-mins / max-of-maxes re-aggregate the partials, so
  *    one map-side-combined shuffle of |groups| rows replaces the window's
  *    full-fact-row exchange plus the distinct's second full-width exchange.
  *    Re-associating Sum is exactly what Spark's own partial aggregation
  *    does: exact for integral (wraparound commutes) and decimal (result is
  *    cast back to the original Sum type, restoring overflow-to-null), and
  *    within the engine's existing float reassociation semantics for
  *    float/double.
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

    // Every partition key must appear in the projection (else the distinct
    // merges rows across partitions — no aggregate regrouping is equivalent).
    // The partition must be NON-EMPTY: a global window over an empty input
    // emits zero rows, a global aggregate emits one — not identity-preserving.
    val partExprs = w.partitionSpec
    if (partExprs.isEmpty) return None
    val keyExprs: Seq[Expression] = keyProjs.map {
      case a: Alias => a.child
      case e => e
    }
    if (!partExprs.forall(p => keyExprs.exists(_.semanticEquals(p)))) return None
    // every plain projected expression must be computable from the window's
    // CHILD — a projection derived from the window output itself (e.g. an
    // alias or function of the windowed sum) cannot move into an aggregate
    // over w.child; rewriting would reference attributes the child lacks
    if (!keyExprs.forall(_.references.subsetOf(w.child.outputSet))) return None

    val extrasExist = !keyExprs.forall(k => partExprs.exists(_.semanticEquals(k)))
    if (!extrasExist) {
      // projection == partition keys: the window collapses to one Aggregate
      val aggExprs: Seq[NamedExpression] = projList.map {
        case ar: AttributeReference if winAggs.contains(ar.exprId) =>
          Alias(winAggs(ar.exprId), ar.name)(exprId = ar.exprId)
        case other => other
      }
      Some(Aggregate(keyExprs, aggExprs, w.child))
    } else rewriteWithExtras(projList, keyProjs, winAggs, partExprs, w)
  }

  /** Decomposed shape: group on ALL projected plain columns (computing one
    * partial per window agg), then re-aggregate the partials with a window
    * over the original partition keys — now over |groups| rows, not facts.
    */
  private def rewriteWithExtras(
      projList: Seq[NamedExpression],
      keyProjs: Seq[NamedExpression],
      winAggs: Map[ExprId, AggregateExpression],
      partExprs: Seq[Expression],
      w: Window): Option[LogicalPlan] = {
    // Sum/Min/Max are the self-decomposable ones (asCompleteAgg admits only
    // these): agg(agg(partials)) == agg(rows) per partition.
    val partials: Seq[(ExprId, Alias)] = winAggs.toSeq.map { case (id, ae) =>
      id -> Alias(ae, s"_graft_partial")()
    }
    val innerAgg = Aggregate(keyProjs.map {
      case a: Alias => a.child
      case e => e
    }, keyProjs ++ partials.map(_._2), w.child)

    // partition keys re-expressed against the inner aggregate's output
    val newKeys: Seq[Expression] = partExprs.map { p =>
      keyProjs.find {
        case a: Alias => a.child.semanticEquals(p)
        case e => e.semanticEquals(p)
      }.map(_.toAttribute).getOrElse(return None)
    }
    val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing)
    val spec = WindowSpecDefinition(newKeys, Nil, frame)
    // fresh ids here; the final Project restores the original ids (and the
    // original result type — Sum over decimal partials widens precision, and
    // the cast back restores the original overflow-to-null behavior)
    val rewrapped: Seq[(ExprId, Alias)] = partials.map { case (id, pAl) =>
      val inner = winAggs(id).aggregateFunction
      val outerFn = inner match {
        case _: Sum => Sum(pAl.toAttribute)
        case _: Min => Min(pAl.toAttribute)
        case _: Max => Max(pAl.toAttribute)
        case _ => return None
      }
      val outer = AggregateExpression(outerFn, Complete, isDistinct = false)
      id -> Alias(WindowExpression(outer, spec), s"_graft_total")()
    }
    val win = Window(rewrapped.map(_._2), newKeys, Nil, innerAgg)
    val byId = rewrapped.toMap
    val outProj: Seq[NamedExpression] = projList.map {
      case ar: AttributeReference if byId.contains(ar.exprId) =>
        val total = byId(ar.exprId).toAttribute
        val restored = if (total.dataType == ar.dataType) total else Cast(total, ar.dataType)
        Alias(restored, ar.name)(exprId = ar.exprId)
      case other => other
    }
    Some(Project(outProj, win))
  }
}

/** Session extension wiring: `SessionFactory` installs this, so every graft
  * session optimizes the window+distinct shape automatically.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => WindowDistinctToAggregate)
    ext.injectPlannerStrategy(_ => TopKPerGroupStrategy)
  }
}
