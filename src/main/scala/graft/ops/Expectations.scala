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

  /** FULL REFERENTIAL-INTEGRITY AUDIT: every foreign-key edge in the schema
    * checked in one report — child cardinality, orphan ROW count and orphan
    * KEY count per relationship (the first tells you the blast radius, the
    * second how many lookups would fix it). The audit includes one
    * DELIBERATELY MISDECLARED edge (l_partkey against supplier) so the
    * violation-reporting path is exercised on data where every true edge is
    * clean — an all-green audit proves nothing about the auditor.
    *
    * Scale shape: each edge is one LEFT ANTI join on its key (broadcast for
    * the small dims, shuffle for fact-fact — Spark picks from size) feeding
    * a two-row aggregate; edges are independent and union at the end, so
    * the report parallelizes edge-by-edge. Nothing driver-side.
    */
  def referentialAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
    val supplier = Tables.supplier(spark, sfDir)
    val part = Tables.part(spark, sfDir)
    val nation = Tables.nation(spark, sfDir)
    val region = Tables.region(spark, sfDir)
    val events = Tables.events(spark, sfDir)

    def edge(name: String, child: DataFrame, fk: String,
        parent: DataFrame, pk: String): DataFrame = {
      val orphans = child.select(col(fk))
        .join(parent.select(col(pk)), col(fk) === col(pk), "left_anti")
        .agg(count(lit(1)).as("n_orphans"),
          countDistinct(col(fk)).as("n_orphan_keys"))
      child.agg(count(lit(1)).as("n_child"))
        .crossJoin(broadcast(orphans))
        .select(lit(name).as("relationship"), col("n_child"),
          col("n_orphans"), col("n_orphan_keys"),
          (col("n_orphans") === 0L).as("passed"))
    }

    Seq(
      edge("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey"),
      edge("lineitem.l_partkey->part", li, "l_partkey", part, "p_partkey"),
      edge("lineitem.l_suppkey->supplier", li, "l_suppkey", supplier, "s_suppkey"),
      edge("orders.o_custkey->customer", orders, "o_custkey", customer, "c_custkey"),
      edge("customer.c_nationkey->nation", customer, "c_nationkey", nation, "n_nationkey"),
      edge("supplier.s_nationkey->nation", supplier, "s_nationkey", nation, "n_nationkey"),
      edge("nation.n_regionkey->region", nation, "n_regionkey", region, "r_regionkey"),
      edge("events.user_id->customer", events, "user_id", customer, "c_custkey"),
      // misdeclared on purpose: parts outnumber suppliers, orphans guaranteed
      edge("lineitem.l_partkey->supplier (misdeclared)",
        li, "l_partkey", supplier, "s_suppkey")
    ).reduce(_ unionByName _)
  }
}
