package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native two-phase top-k operator: result identity with the window
  * spelling, correct physical shape (partial → exchange → final), bounded
  * shuffle, and edge cases (k larger than group, ties broken by the
  * tiebreaker, null group keys grouped together).
  */
class TopKPerGroupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("matches the window spelling exactly on orders") {
    val orders = graft.core.Tables.orders(spark, sf)
    val got = TopKPerGroup.topK(orders,
      Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val expect = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("plans as partial exec, one exchange on the group key, final exec") {
    val got = TopKPerGroup.topK(graft.core.Tables.orders(spark, sf),
      Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), 2)
    val p = got.queryExecution.executedPlan.toString
    assert("TopKPerGroup".r.findAllIn(p).size == 2, p)
    assert("Exchange hashpartitioning\\(o_custkey".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Window") && !p.contains("Sort "), p)
  }

  test("partial phase bounds what reaches the shuffle") {
    // single wide group: every input partition may contribute at most k rows
    val n = spark.range(0, 10000, 1, 8)
      .select(lit(1L).as("g"), col("id"))
    val got = TopKPerGroup.topK(n, Seq("g"), Seq(("id", false)), 5)
      .collect().map(_.getLong(1)).sorted
    assert(got.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("k larger than the group returns the whole group; null keys group") {
    import spark.implicits._
    val df = Seq((Some(1), 10), (Some(1), 20), (None: Option[Int], 7), (None, 3))
      .toDF("g", "v")
    val got = TopKPerGroup.topK(df, Seq("g"), Seq(("v", true)), 5)
      .collect().map(r => (Option(r.get(0)), r.getInt(1))).toSet
    assert(got == Set((Some(1), 10), (Some(1), 20), (None, 7), (None, 3)))
    val top1 = TopKPerGroup.topK(df, Seq("g"), Seq(("v", true)), 1)
      .collect().map(r => (Option(r.get(0)), r.getInt(1))).toSet
    assert(top1 == Set((Some(1), 20), (None, 7)))
  }
}
