package graft.tools

import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

object RuleDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.SessionFactory.local(4, "rule-debug")
    println("EXT_CONF=" + spark.conf.get("spark.sql.extensions", "<unset>"))
    val batches = spark.sessionState.optimizer.batches
      .filter(_.rules.exists(_.ruleName.contains("WindowDistinct")))
    println("RULE_REGISTERED=" + batches.nonEmpty)
    val orders = graft.core.Tables.orders(spark, "/root/testdata/sf0.001")
    val w = W.partitionBy(col("o_custkey"))
    val shaped = orders.select(col("o_custkey"), sum(col("o_totalprice")).over(w).as("total")).distinct()
    // apply the rule directly to the pre-optimized plan to isolate pattern vs registration
    val manual = graft.plans.WindowDistinctToAggregate(
      shaped.queryExecution.analyzed)
    println("MANUAL_REWRITE_HAS_WINDOW=" + manual.toString.contains("Window"))
    println("OPT_HAS_WINDOW=" + shaped.queryExecution.optimizedPlan.toString.contains("Window"))
    spark.stop()
  }
}
