package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Declarative data-quality expectations — the dbt-test / Great-Expectations
  * tier: a fixed suite of checks (not-null, key uniqueness, accepted range,
  * referential integrity) evaluated as aggregates and reported as one row
  * per check. A pipeline gates promotion on `passed`; the report itself is
  * the artifact.
  *
  * Scale shape: every check is a single aggregate over a pruned scan —
  * not-null and range checks are map-side-only sums; uniqueness is one
  * narrow (key → count) aggregate; referential integrity is a
  * LEFT ANTI join on the key (broadcast or shuffle as the dim size
  * dictates, never a cartesian). Nothing returns rows to the driver — the
  * violation COUNT is the deliverable, offending-row samples are a
  * `.filter` away on the same predicates.
  *
  * The suite deliberately includes a FAILING expectation (ship dates past
  * 2000 exist in the data) so the reporting path for failures is exercised,
  * not just the all-green path.
  */
object Expectations {

  def checkSuite(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)

    def report(name: String, checked: DataFrame): DataFrame = checked
      .select(lit(name).as("check_name"), col("n_checked"), col("n_violations"),
        (col("n_violations") === 0L).as("passed"))

    val notNull = report("lineitem_orderkey_not_null",
      li.agg(count(lit(1)).as("n_checked"),
        sum(when(col("l_orderkey").isNull, 1L).otherwise(0L)).as("n_violations")))

    // violations = rows beyond the first per duplicate key
    val uniqueKey = report("lineitem_key_unique",
      li.groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("n_checked"),
          sum(col("cnt") - 1).as("n_violations")))

    val discountRange = report("discount_in_unit_range",
      li.agg(count(lit(1)).as("n_checked"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1L)
          .otherwise(0L)).as("n_violations")))

    // deliberately failing: the data ships dates past this horizon
    val shipHorizon = report("shipdate_before_2000",
      li.agg(count(lit(1)).as("n_checked"),
        sum(when(col("l_shipdate") >= lit("2000-01-01").cast("timestamp_ntz"), 1L)
          .otherwise(0L)).as("n_violations")))

    val refIntegrity = report("orderkey_in_orders",
      li.select(col("l_orderkey"))
        .join(orders.select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .crossJoin(broadcast(li.agg(count(lit(1)).as("n_checked")))))

    Seq(notNull, uniqueKey, discountRange, shipHorizon, refIntegrity)
      .reduce(_ unionByName _)
  }
}
