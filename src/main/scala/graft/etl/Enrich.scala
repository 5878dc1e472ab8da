package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Num, Tables}

/** Dimension enrichment — the Spark-native re-expression of the reference's
  * J1·J2·J3 fact→dim inner-join chain
  * (`/root/reference/src/transform/transform.py:88-117`).
  *
  * Role mapping onto the driver testdata (FIXTURES.md §5): the sales fact is
  * lineitem⋈orders (`total_cost` = l_extendedprice·(1−l_discount), `sales_date` =
  * o_orderdate), the customer dim is `customer`, the salesperson dim is `supplier`
  * (J3 analogue), and the store dim is the supplier's `nation` (J2 analogue).
  *
  * Scale design: the fact side is arbitrarily large (100 TB); every dimension here
  * is orders-of-magnitude smaller, so each dim join is expected to broadcast — the
  * whole enrichment is then a single scan of the fact with zero shuffles. Only the
  * FIXED-cardinality nation dim carries an explicit `broadcast` hint (25 rows at
  * any SF — a hint that can never break). Customer and supplier SCALE WITH THE
  * FACT TABLE's SF, so their joins are deliberately un-hinted (r18 verdict item 6):
  * Catalyst/AQE broadcasts them from measured size while they fit and falls back
  * to a shuffle join when they outgrow the threshold — a forced hint would instead
  * OOM at the 100 TB design point. Nothing else in this code pins a physical
  * strategy. The reference
  * leaves join selection implicit and never caches the enriched lineage (it is
  * recomputed ≥6×, `/root/reference/src/main_1.py:784-795`) — callers here reuse
  * one DataFrame and may `.cache()` it when multiple marts/metrics consume it.
  */
object Enrich {

  /** The sales "fact": one row per lineitem with its order context. */
  def salesFact(spark: SparkSession, sfDir: String): DataFrame =
    salesFactFrom(Tables.lineitem(spark, sfDir), spark, sfDir)

  /** Same join, but over a caller-supplied lineitem frame (e.g. the validated
    * CSV batch in [[graft.pipeline.SalesEtlJob]] rather than the parquet table).
    */
  def salesFactFrom(li: DataFrame, spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    // orders is ~4x smaller than lineitem but both scale with SF: this is the one
    // genuinely large join — leave strategy to Catalyst/AQE (sort-merge at scale,
    // broadcast at small SF) rather than forcing a hint that breaks at 100 TB.
    li.join(ord, li("l_orderkey") === ord("o_orderkey"), "inner")
  }

  /** J1–J3: fact joined to customer, salesperson (supplier) and store (nation) dims
    * (nation hinted, customer/supplier left to AQE — see the object doc). Output
    * keeps qualified-unambiguous columns only — the reference's qualified-string
    * `.drop` bug (SURVEY §2.3 hazard) is avoided by selecting through the dim
    * DataFrames' own column references.
    */
  def enriched(spark: SparkSession, sfDir: String): DataFrame =
    enrichedFromFact(salesFact(spark, sfDir), spark, sfDir)

  /** J1–J3 over a caller-supplied fact (already joined to orders). */
  def enrichedFromFact(fact: DataFrame, spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    val nat  = Tables.nation(spark, sfDir)

    fact
      .join(cust, fact("o_custkey") === cust("c_custkey"), "inner")
      .join(supp, fact("l_suppkey") === supp("s_suppkey"), "inner")
      .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"), "inner")
  }

  /** `sales_date` analogue: order timestamp rendered as the reference's string date
    * (`/root/reference/src/main_1.py:498` keeps dates as strings).
    */
  def salesDate: Column = date_format(col("o_orderdate"), "yyyy-MM-dd")

  /** `sales_month` analogue of `SUBSTRING(sales_date,1,7)`
    * (`/root/reference/src/transform/transform.py:126,142`).
    */
  def salesMonth: Column = substring(salesDate, 1, 7)

  /** `total_cost` analogue: per-line revenue. */
  def totalCost: Column = Num.revenue
}
