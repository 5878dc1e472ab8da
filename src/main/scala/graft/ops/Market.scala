package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** PRICE ELASTICITY OF DEMAND per part brand: the log-log regression
    * ln(quantity) ~ ln(avg unit price) over monthly aggregates — the
    * econometric slope IS the elasticity (a 1% price move shifts demand by
    * `elasticity`%). The q143 moment recipe lifted onto BRIDGED
    * TRANSCENDENTALS: monthly sums fold as exact decimals, both lns cross
    * the 12-decimal bridge (magnitudes ~5–15, deep inside the §8.4-safe
    * band), and the per-brand regression folds DECIMAL(28,12)-quantized
    * ln-products exactly, so the slope is one fixed correctly-rounded
    * tree. Scale shape: one lineitem×part join (dim join — AQE broadcasts
    * while part fits, degrades to shuffle when it doesn't), a
    * (brand × month) aggregate, then |brands|-row arithmetic.
    */
  def priceElasticity(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.core.Num
    val d = DecimalType(18, 2)
    val monthly = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate"))).cast("long").as("m"))
      .agg(sum(col("l_extendedprice").cast(d)).as("sp"),
        sum(col("l_quantity").cast(d)).as("sq"))
    def ln12(c: Column): Column =
      Num.decToDouble(log(c).cast(DecimalType(18, 12)))
    val x = ln12(Num.decToDouble(col("sp")) / Num.decToDouble(col("sq")))
    val y = ln12(Num.decToDouble(col("sq")))
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(28, 12))
    val moments = monthly
      .select(col("brand"), x.as("x"), y.as("y"))
      .groupBy(col("brand"))
      .agg(count(lit(1)).as("n_months"),
        Num.decToDouble(sum(q12(col("x")))).as("sx"),
        Num.decToDouble(sum(q12(col("y")))).as("sy"),
        Num.decToDouble(sum(q12(col("x") * col("x")))).as("sxx"),
        Num.decToDouble(sum(q12(col("y") * col("y")))).as("syy"),
        Num.decToDouble(sum(q12(col("x") * col("y")))).as("sxy"))
    val n = col("n_months").cast("double")
    val cov = n * col("sxy") - col("sx") * col("sy")
    val varx = n * col("sxx") - col("sx") * col("sx")
    val vary = n * col("syy") - col("sy") * col("sy")
    moments.select(col("brand"), col("n_months"),
      (cov / varx).as("elasticity"),
      (cov / (sqrt(varx) * sqrt(vary))).as("corr"))
  }

  /** RFM customer segmentation: per-customer Recency (days since last
    * order, against the table's global max date), Frequency (order count)
    * and Monetary (exact-decimal revenue), each scored into quartiles —
    * the classic CRM cut. Scoring reuses the q170 boundary convention
    * (boundaries at exact order statistics, score = 1 + #boundaries
    * strictly below; recency INVERTED so recent = 4): value-deterministic
    * where `ntile` is not, which is what makes the oracle exact. One
    * aggregate over orders builds the |customers|-row RFM frame; three
    * single-column rank windows find 9 boundary values that ride along as
    * one broadcast row — no second pass over the fact table, no
    * driver-side collect.
    */
  def rfmSegments(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val orders = Tables.orders(spark, sfDir)
    val maxDate = orders.agg(max(to_date(col("o_orderdate"))).as("max_d"))
    val rfm = orders
      .groupBy(col("o_custkey").as("cust"))
      .agg(max(to_date(col("o_orderdate"))).as("last_d"),
        count(lit(1)).as("freq"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("monetary"))
      .crossJoin(broadcast(maxDate))
      .select(col("cust"), datediff(col("max_d"), col("last_d")).cast("long").as("recency"),
        col("freq"), col("monetary"))
      .persist()
    // quartile boundaries of one dimension, as a single-row array frame
    def bounds(valueCol: String): DataFrame = {
      val w = Window.orderBy(col(valueCol))
      rfm.select(col(valueCol))
        .withColumn("rn", row_number().over(w))
        // broadcast one-row count, not a second no-partition window (q189
        // convention: one whitelisted bare-value sort per boundary pass)
        .crossJoin(broadcast(rfm.agg(count(lit(1)).as("n"))))
        .select(col(valueCol), col("rn"), col("n"),
          explode(array(lit(1), lit(2), lit(3))).as("i"))
        .filter(col("rn") === ceil(col("i").cast("double") * col("n") / 4))
        .agg(sort_array(collect_list(col(valueCol).cast("double"))).as(s"${valueCol}_bs"))
    }
    def score(valueCol: String): org.apache.spark.sql.Column =
      (lit(1) + size(filter(col(s"${valueCol}_bs"), b => b < col(valueCol).cast("double"))))
        .cast("long")
    val result = rfm
      .crossJoin(broadcast(bounds("recency")))
      .crossJoin(broadcast(bounds("freq")))
      .crossJoin(broadcast(bounds("monetary")))
      .select(col("cust"), col("recency"), col("freq"), col("monetary"),
        (lit(5L) - score("recency")).as("r_score"), // recent (small) = high score
        score("freq").as("f_score"),
        score("monetary").as("m_score"))
      .localCheckpoint(true)
    rfm.unpersist()
    result
  }
}
