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

  test("extra projected columns decompose into aggregate + window-over-groups") {
    // o_orderstatus is NOT a partition key (and not functionally dependent on
    // one) — the decomposed rewrite is still exact: partials per
    // (custkey, status) group, re-summed per custkey over |groups| rows
    val w = W.partitionBy(col("o_custkey"))
    val shaped = orders
      .select(col("o_custkey"), col("o_orderstatus"),
        sum(col("o_totalprice")).over(w).as("total"))
      .distinct()
    val optimized = shaped.queryExecution.optimizedPlan
    // the Window survives but must now sit over an Aggregate, not the scan
    val winNodes = optimized.collect {
      case win: org.apache.spark.sql.catalyst.plans.logical.Window => win
    }
    assert(winNodes.nonEmpty)
    assert(winNodes.forall(_.collectFirst {
      case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => ()
    }.nonEmpty), optimized.toString)
    // identity proof against an independently-computed expected result
    val totals = orders.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("total"))
    val expected = orders.select(col("o_custkey"), col("o_orderstatus")).distinct()
      .join(totals, "o_custkey")
    assert(shaped.schema == expected.schema,
      s"${shaped.schema} != ${expected.schema}")
    assert(shaped.exceptAll(expected).isEmpty && expected.exceptAll(shaped).isEmpty)
  }

  test("projections derived from the window output do not rewrite (or crash)") {
    // t2 is computed FROM the windowed sum — no aggregate over the window's
    // child can express it; the rule must leave the plan alone, not emit a
    // plan referencing attributes the child lacks
    val w = W.partitionBy(col("o_custkey"))
    val shaped = orders
      .select(col("o_custkey"), sum(col("o_totalprice")).over(w).as("total"))
      .select(col("o_custkey"), col("total"), (col("total") * 2).as("t2"))
      .distinct()
    val expected = orders.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("total"))
      .select(col("o_custkey"), col("total"), (col("total") * 2).as("t2"))
    assert(shaped.exceptAll(expected).isEmpty && expected.exceptAll(shaped).isEmpty)
  }

  test("decomposed rewrite groups null partition keys like the window does") {
    import spark.implicits._
    val df = Seq(
      (Some(1), "a", 10L), (Some(1), "b", 5L), (None: Option[Int], "a", 7L),
      (None, "a", 3L), (None, "c", 1L))
      .toDF("k", "e", "x")
    val shaped = df
      .select(col("k"), col("e"), sum(col("x")).over(W.partitionBy(col("k"))).as("total"))
      .distinct()
    val got = shaped.collect().map(r => (Option(r.get(0)), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      (Some(1), "a", 15L), (Some(1), "b", 15L),
      (None, "a", 11L), (None, "c", 11L)))
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
