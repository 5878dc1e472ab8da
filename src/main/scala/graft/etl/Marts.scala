package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-mart projections — re-expressions of the reference's two mart selects
  * (customer mart `/root/reference/src/main_1.py:423-432`, sales-team mart
  * `/root/reference/src/main_1.py:486-499`).
  *
  * The projections are deliberately narrow selects directly over the enriched join:
  * Catalyst's ColumnPruning pushes the column set all the way into the parquet scans
  * (the reference prunes by hand with post-join `.drop`s instead, SURVEY §4), so at
  * 100 TB only the ~10 referenced columns are ever read.
  */
object Marts {

  /** Customer data mart: who bought, where they live, what they spent.
    * Reference shape: `customer_data_mart(customer_id, first_name, last_name,
    * address, pincode, phone_number, sales_date, total_cost)`.
    */
  def customerMart(spark: SparkSession, sfDir: String): DataFrame =
    customerMartFrom(Enrich.enriched(spark, sfDir))

  /** Same projection over a caller-supplied (typically cached) enriched frame. */
  def customerMartFrom(enriched: DataFrame): DataFrame =
    enriched.select(
      col("c_custkey").as("customer_id"),
      col("c_name").as("customer_name"),
      col("n_name").as("nation_name"),
      col("c_mktsegment").as("mktsegment"),
      Enrich.salesDate.as("sales_date"),
      Enrich.totalCost.as("total_cost"))

  /** Sales-team data mart, with the derived `sales_month` partition key
    * (`main_1.py:498` + partitioned write at `:523-529`).
    */
  def salesTeamMart(spark: SparkSession, sfDir: String): DataFrame =
    salesTeamMartFrom(Enrich.enriched(spark, sfDir))

  /** Same projection over a caller-supplied (typically cached) enriched frame. */
  def salesTeamMartFrom(enriched: DataFrame): DataFrame =
    enriched.select(
      col("n_nationkey").as("store_id"),
      col("n_name").as("store_name"),
      col("s_suppkey").as("sales_person_id"),
      col("s_name").as("sales_person_name"),
      col("o_orderkey").as("order_id"),
      Enrich.salesDate.as("sales_date"),
      Enrich.totalCost.as("total_cost"),
      Enrich.salesMonth.as("sales_month"))
}
