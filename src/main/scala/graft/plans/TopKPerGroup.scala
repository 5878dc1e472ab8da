package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Top-k rows per group as a first-class operator — the per-group
  * generalization of Spark's own `TakeOrderedAndProject` (extension-ladder
  * tier (c): LogicalPlan + SparkStrategy + SparkPlan, registered through
  * [[GraftExtensions]]).
  *
  * The built-in spelling (`row_number() OVER (PARTITION BY … ORDER BY …) ≤
  * k`, see `Relational.topOrderPerCustomer`) shuffles EVERY row to its
  * group's reducer and fully sorts each group, only to discard all but k.
  * This operator runs in two phases, exactly like a partial aggregate:
  *
  *  - partial (before the exchange): each input partition keeps at most k
  *    rows per group in a bounded heap — O(k · groups-per-partition) memory,
  *    O(log k) per row, no sort;
  *  - the exchange then moves AT MOST k rows per (group, input partition) —
  *    at 100 TB with k=1 this is the difference between shuffling the fact
  *    table and shuffling one row per group per map task;
  *  - final (after the exchange): the same bounded-heap pass over the
  *    now-co-located candidates yields the exact global top-k per group.
  *
  * The sort order must be TOTAL (add a tiebreaker column) for deterministic
  * results — the same requirement the window spelling has. Output row order
  * within a group is unspecified, like any aggregate.
  */
final case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    sortOrders: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Planner rule: one logical node → partial exec, exchange (inserted by
  * EnsureRequirements from the final's required distribution), final exec.
  */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, s, k, child) =>
      val partial = TopKPerGroupExec(g, s, k, planLater(child), partial = true)
      TopKPerGroupExec(g, s, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    sortOrders: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupExprsLocal = groupExprs
    val sortOrdersLocal = sortOrders
    val kLocal = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupExprsLocal, childOutput)
      // identity projection: normalizes whatever row class the child emits
      // to UnsafeRow (needed for map-key equality and cheap copies)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      // codegen'd comparator over the sort order; the heap keeps the k
      // FIRST rows per that order, with the worst kept row at the head
      val cmp = GenerateOrdering.generate(sortOrdersLocal, childOutput)
      val heapOrd: Ordering[UnsafeRow] = (a: UnsafeRow, b: UnsafeRow) => cmp.compare(a, b)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val unsafe = toUnsafe(row)
        val key = keyProj(unsafe)
        heaps.get(key) match {
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](heapOrd)
            h += unsafe.copy()
            heaps.put(key.copy(), h)
          case Some(h) =>
            if (h.size < kLocal) h += unsafe.copy()
            else if (cmp.compare(unsafe, h.head) < 0) { h.dequeue(); h += unsafe.copy() }
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }
}

object TopKPerGroup {

  /** Public API: exact top-k rows per group. Sort specs are (column,
    * descending?) pairs — include a tiebreaker for a total order. Columns are
    * resolved directly against the frame's analyzed output (Spark 4's public
    * `Column` wraps a ColumnNode that only converts to a Catalyst expression
    * on the Dataset API paths, so a hand-built plan resolves names itself).
    */
  def topK(df: DataFrame, groupCols: Seq[String], orderCols: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(groupCols.nonEmpty, "topK needs at least one group column")
    val child = df.queryExecution.analyzed
    // honor the session's name resolution (case-insensitive by default) and
    // refuse ambiguity instead of silently binding the first match
    val resolver = df.sparkSession.sessionState.conf.resolver
    def attr(name: String): Attribute = child.output.filter(a => resolver(a.name, name)) match {
      case Seq(a) => a
      case Seq() => throw new IllegalArgumentException(
        s"column $name not in ${child.output.map(_.name).mkString(", ")}")
      case many => throw new IllegalArgumentException(
        s"column $name is ambiguous: matches ${many.map(_.name).mkString(", ")}")
    }
    val sortOrders = orderCols.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerGroupNode(groupCols.map(attr), sortOrders, k, child))
  }
}
