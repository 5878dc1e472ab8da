package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{Num, Tables}

/** Neighborhood-based recommendation primitives over the order/part bipartite
  * graph — the "customers who bought X also bought Y" tier one level above
  * [[Market.basketPairs]]' association rules (cosine-normalized similarity
  * and common-neighbor link prediction instead of raw support/lift).
  * Reference scope ends at per-customer marts
  * (`/root/reference/src/transform/transform.py`); this is the natural
  * cross-item extension a sales engine grows next.
  */
object Recommend {

  private def baskets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct() // presence, not multiplicity

  /** ITEM-ITEM COLLABORATIVE FILTERING: top-k most similar parts per part,
    * cosine similarity over binary basket vectors — sim(i,j) =
    * n_both / √(nᵢ·nⱼ), the classic Amazon item-to-item scheme (Linden et
    * al. 2003, public). Pair generation is per-basket (O(k²) per order,
    * never all-parts), support-cut BEFORE the broadcast frequency joins
    * (the Apriori anti-monotone prune), symmetrized, and ranked by a
    * PARTITIONED window (per-item neighbor lists — no global sort). The
    * score is one fixed correctly-rounded tree over exact longs
    * (`n/√(nᵢ·nⱼ)`), and ties rank by neighbor id — fully deterministic,
    * which is what lets the top-k list hash-match the oracle.
    */
  def itemItemCf(spark: SparkSession, sfDir: String,
      minSupport: Int = 3, topK: Int = 3): DataFrame = {
    val li = baskets(spark, sfDir)
    val itemCounts = li.groupBy(col("pk")).agg(count(lit(1)).as("n_item"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minSupport)
    val sym = pairs.select(col("pa").as("item"), col("pb").as("neighbor"), col("n_both"))
      .unionByName(pairs.select(col("pb").as("item"), col("pa").as("neighbor"), col("n_both")))
    val scored = sym
      .join(broadcast(itemCounts.select(col("pk").as("item"), col("n_item").as("n_i"))), "item")
      .join(broadcast(itemCounts.select(col("pk").as("neighbor"), col("n_item").as("n_j"))), "neighbor")
      .withColumn("score", col("n_both").cast("double") /
        sqrt(col("n_i").cast("double") * col("n_j").cast("double")))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("item")).orderBy(col("score").desc, col("neighbor")))
        .cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("item"), col("neighbor"), col("n_both"), col("n_i"),
        col("n_j"), col("score"), col("rnk"))
  }

  /** ADAMIC–ADAR LINK PREDICTION over the order/part bipartite graph:
    * AA(i,j) = Σ_o 1/ln(k_o) over the shared baskets o, weighting each
    * common neighbor inversely by the log of its degree (Adamic & Adar
    * 2003, public) — a rare co-purchase in a 2-item order says far more
    * than one in a 7-item order. Scale shape: basket sizes are one
    * aggregate; pair fan-out is per-basket O(k²); the weight joins in by
    * order key (already co-partitioned with the pair stream). Determinism:
    * ln crosses the 12-decimal bridge (JVM Math.log vs libm differ by
    * 1 ulp), the reciprocal is one correctly-rounded division of identical
    * doubles, and the per-pair SUM quantizes each term to DECIMAL(28,12)
    * and folds exactly — double accumulation order never matters.
    */
  def adamicAdar(spark: SparkSession, sfDir: String, minShared: Int = 2): DataFrame = {
    val li = baskets(spark, sfDir)
    val weights = li.groupBy(col("ok")).agg(count(lit(1)).as("k"))
      .filter(col("k") >= 2)
      .withColumn("inv", lit(1.0) /
        Num.decToDouble(log(col("k").cast("double")).cast(DecimalType(18, 12))))
      .withColumn("invq", col("inv").cast("string").cast(DecimalType(28, 12)))
    li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("part_a"), col("b.pk").as("part_b"), col("a.ok").as("ok"))
      .join(weights.select(col("ok"), col("invq")), "ok")
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_shared"),
        Num.decToDouble(sum(col("invq"))).as("aa"))
      .filter(col("n_shared") >= minShared)
  }
}
