package graft.plans

import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The window+distinct→aggregate rule: fires exactly when provably safe,
  * preserves results, and stays out of the way otherwise.
  */
class WindowDistinctToAggregateSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def orders = graft.core.Tables.orders(spark, sf)

  test("the reference anti-pattern rewrites to one hash aggregate") {
    val w = W.partitionBy(col("o_custkey"))
    val shaped = orders
      .select(col("o_custkey"),
        sum(col("o_totalprice")).over(w).as("total"))
      .distinct()
    val optimized = shaped.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("Window"), optimized)
    assert(optimized.contains("Aggregate"))
    // and the rewrite is identity-preserving
    val expected = orders.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("total"))
    assert(shaped.exceptAll(expected).isEmpty && expected.exceptAll(shaped).isEmpty)
  }

  test("a projection beyond the partition keys is NOT rewritten") {
    // o_orderstatus is not a partition key and not provably dependent on one —
    // rewriting would change results; the rule must leave the Window in place
    val w = W.partitionBy(col("o_custkey"))
    val shaped = orders
      .select(col("o_custkey"), col("o_orderstatus"),
        sum(col("o_totalprice")).over(w).as("total"))
      .distinct()
    assert(shaped.queryExecution.optimizedPlan.toString.contains("Window"))
  }

  test("a global (empty-partition) window is NOT rewritten") {
    // over an empty input the window emits 0 rows but a global aggregate
    // emits 1 — the rule must refuse
    val shaped = orders.filter(lit(false))
      .select(sum(col("o_totalprice")).over(W.partitionBy()).as("total"))
      .distinct()
    assert(shaped.queryExecution.optimizedPlan.toString.contains("Window") ||
      shaped.count() == 0)
    assert(shaped.count() == 0)
  }

  test("ordered windows (running totals) are NOT rewritten") {
    val w = W.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val shaped = orders
      .select(col("o_custkey"), sum(col("o_totalprice")).over(w).as("running"))
      .distinct()
    assert(shaped.queryExecution.optimizedPlan.toString.contains("Window"))
  }
}
