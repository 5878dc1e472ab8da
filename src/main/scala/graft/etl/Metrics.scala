package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Num

/** The reference's two analytic queries (its whole reason to exist,
  * `/root/reference/README.md:11-13`), in both execution modes:
  *
  *  - `bitCompat`: the reference's literal shape — windowed sum + `.distinct()`
  *    (`/root/reference/src/transform/transform.py:123-136`, `:139-158`). Kept for
  *    semantic parity testing.
  *  - idiomatic (default): `groupBy().agg()` — equivalent here because every
  *    projected column is functionally dependent on the grouping keys (SURVEY §2.4),
  *    and strictly better at scale: partial (map-side) aggregation shrinks the
  *    shuffle to |groups| rows, where the window variant shuffles every fact row
  *    and then hash-aggregates the full width for distinct.
  *
  * Money sums go through exact decimal arithmetic (see [[graft.core.Num]]) so results
  * are identical regardless of partition count — a 32-thread local run and a
  * 1000-executor cluster produce byte-identical marts.
  */
object Metrics {

  // ---------------------------------------------------------------- customer spend

  /** Customer monthly purchase (A1+W1): total spend per customer per month.
    * Output: customer_id, full_name, sales_month, total_sales.
    */
  def customerMonthly(spark: SparkSession, sfDir: String): DataFrame =
    customerMonthlyFrom(Enrich.enriched(spark, sfDir))

  /** Same metric over a caller-supplied (typically cached) enriched frame. */
  def customerMonthlyFrom(enriched: DataFrame): DataFrame =
    enriched
      .groupBy(
        col("c_custkey").as("customer_id"),
        col("c_name").as("full_name"),
        Enrich.salesMonth.as("sales_month"))
      .agg(Num.sum4(Enrich.totalCost).as("total_sales"))

  /** Reference-shaped variant: window sum then distinct
    * (`transform.py:124-132`). Equivalent output; used in cross-check tests.
    */
  def customerMonthlyBitCompat(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("customer_id"), col("sales_month"))
    Enrich.enriched(spark, sfDir)
      .select(
        col("c_custkey").as("customer_id"),
        col("c_name").as("full_name"),
        Enrich.salesMonth.as("sales_month"),
        Enrich.totalCost.cast(DecimalType(22, 4)).as("cost"))
      .withColumn("total_sales", sum(col("cost")).over(w).cast("double"))
      .drop("cost")
      .distinct()
  }

  // ---------------------------------------------------------------- incentive

  /** Monthly per-salesperson totals per store (A2+W2 analogue): supplier plays the
    * salesperson, the supplier's nation plays the store.
    */
  def salesPersonMonthly(spark: SparkSession, sfDir: String): DataFrame =
    salesPersonMonthlyFrom(Enrich.enriched(spark, sfDir))

  /** Same metric over a caller-supplied (typically cached) enriched frame. */
  def salesPersonMonthlyFrom(enriched: DataFrame): DataFrame =
    enriched
      .groupBy(
        col("n_nationkey").as("store_id"),
        col("s_suppkey").as("sales_person_id"),
        col("s_name").as("full_name"),
        Enrich.salesMonth.as("sales_month"))
      .agg(sum(Enrich.totalCost.cast(DecimalType(22, 4))).as("total_dec"))

  /** Sales-team incentive (W3+W4): rank salespeople per (store, month) by monthly
    * total; rank 1 earns 1% of their sales, everyone else 0. `rank()` — not
    * row_number — so ties at the top BOTH get the incentive, exactly the reference's
    * tie semantics (`transform.py:150-153`, SURVEY §2.5).
    *
    * Output: store_id, sales_person_id, full_name, sales_month,
    * total_sales_every_month, incentive.
    */
  def salesIncentive(spark: SparkSession, sfDir: String): DataFrame =
    salesIncentiveFromMonthly(salesPersonMonthly(spark, sfDir))

  /** Same metric over a caller-supplied (typically cached) enriched frame. */
  def salesIncentiveFrom(enriched: DataFrame): DataFrame =
    salesIncentiveFromMonthly(salesPersonMonthlyFrom(enriched))

  private def salesIncentiveFromMonthly(monthly: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("store_id"), col("sales_month"))
      .orderBy(col("total_dec").desc)
    // 1% and the rounding both stay in the exact decimal domain: round() on a
    // *double* is not portable across engines (Spark rounds the shortest decimal
    // rendering, C-family engines round the binary value), while decimal round is
    // HALF_UP on positives everywhere.
    val pct = lit(new java.math.BigDecimal("0.01"))
    monthly
      .withColumn("rnk", rank().over(w))
      .withColumn(
        "incentive",
        when(col("rnk") === 1, round(col("total_dec") * pct, 2).cast("double"))
          .otherwise(lit(0.0)))
      .select(
        col("store_id"), col("sales_person_id"), col("full_name"),
        col("sales_month"),
        col("total_dec").cast("double").as("total_sales_every_month"),
        col("incentive"))
  }
}
