package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Market-basket analysis: association rules over order contents — the
  * co-occurrence mining the reference's sales marts stop short of
  * (`/root/reference/src/transform/transform.py` aggregates per-customer and
  * per-salesperson; cross-item structure is the natural next analytics tier).
  */
object Market {

  /** Frequent part PAIRS with support, confidence, and lift. Pair
    * generation is per-basket — a self-join on the order key, O(k²) rows
    * per basket bounded by basket size, never an all-parts cross product —
    * then one partial-aggregated count per pair, pruned by `minSupport`
    * BEFORE the dimension joins (the anti-monotone Apriori cut: a pair
    * below min support can't matter downstream, so the long tail dies in
    * the first aggregate). Item counts and the basket total ride in as a
    * broadcast (|parts|-sized) join and a one-row frame. All ratios are
    * single IEEE divisions of exact longs (confidence = both/a; lift =
    * both·N / (a·b)) — deterministic, no double accumulation anywhere.
    */
  def basketPairs(spark: SparkSession, sfDir: String, minSupport: Int = 3): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct() // presence, not multiplicity: a basket counts a part once
    val itemCounts = li.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
    val nOrders = li.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val pairCounts = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minSupport)
    pairCounts
      .join(broadcast(itemCounts.select(col("pk").as("part_a"), col("n_item").as("n_a"))), "part_a")
      .join(broadcast(itemCounts.select(col("pk").as("part_b"), col("n_item").as("n_b"))), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("n_both"), col("n_a"),
        col("n_b"), col("n_orders"),
        (col("n_both").cast("double") / col("n_a")).as("confidence"),
        ((col("n_both") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b"))).as("lift"))
  }
}
