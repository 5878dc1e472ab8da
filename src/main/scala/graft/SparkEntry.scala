package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.{Marts, Metrics}
import graft.ops.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 appears once in `queries`, with a
  * DuckDB-runnable oracle twin in `oracleSql` (same column names — the driver sorts
  * columns by name before hashing). Numeric determinism strategy: see
  * [[graft.core.Num]] — exact decimal aggregation, decimal-domain rounding, doubles
  * only for per-row IEEE-deterministic arithmetic.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Metrics.salesIncentive(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_csv_ingest"       -> ((s, d) => Relational.csvIngest(s, d)),
    "q02_filter"           -> ((s, d) => Relational.filterShipments(s, d)),
    "q03_pricing_summary"  -> ((s, d) => Relational.pricingSummary(s, d)),
    "q04_distinct"         -> ((s, d) => Relational.distinctFlags(s, d)),
    "q05_union_all"        -> ((s, d) => Relational.unionSlices(s, d)),
    "q06_running_total"    -> ((s, d) => Relational.runningCustomerSpend(s, d)),
    "q07_rank_in_group"    -> ((s, d) => Relational.rankCustomersByBalance(s, d)),
    "q08_top_per_group"    -> ((s, d) => Relational.topOrderPerCustomer(s, d)),
    "q09_scalar_funcs"     -> ((s, d) => Relational.scalarShowcase(s, d)),
    "q10_customer_mart"    -> ((s, d) => Marts.customerMart(s, d)),
    "q11_sales_mart"       -> ((s, d) => Marts.salesTeamMart(s, d)),
    "q12_customer_monthly" -> ((s, d) => Metrics.customerMonthly(s, d)),
    "q13_sales_incentive"  -> ((s, d) => Metrics.salesIncentive(s, d)))

  /** Shared oracle fragments (DuckDB SQL). */
  private val enrichJoin: String =
    """FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey""".stripMargin

  private val totalCost = "l_extendedprice * (CAST(1 AS DOUBLE) - l_discount)"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_csv_ingest" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        |FROM lineitem""".stripMargin,

    "q02_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        |  AND l_discount >= CAST(0.05 AS DOUBLE) AND l_quantity < CAST(25 AS DOUBLE)""".stripMargin,

    "q03_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (CAST(1 AS DOUBLE) - l_discount) AS DECIMAL(22,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q04_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "q05_union_all" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'O'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus <> 'O'""".stripMargin,

    "q06_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders""".stripMargin,

    "q07_rank_in_group" ->
      """SELECT * FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |         CAST(rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INTEGER) AS balance_rank
        |  FROM customer)
        |WHERE balance_rank <= 3""".stripMargin,

    "q08_top_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn = 1""".stripMargin,

    "q09_scalar_funcs" ->
      """SELECT c_custkey,
        |  c_name || ' / ' || c_mktsegment AS display_name,
        |  concat_ws('-', substr(c_name, 1, 8), c_mktsegment) AS name_key,
        |  CASE WHEN c_acctbal < 0 THEN 'NEGATIVE'
        |       WHEN c_acctbal < 5000 THEN 'MID'
        |       ELSE 'HIGH' END AS balance_band,
        |  CAST(round(CAST(c_acctbal AS DECIMAL(18,2)) * 0.02, 2) AS DOUBLE) AS service_fee
        |FROM customer""".stripMargin,

    "q10_customer_mart" ->
      s"""SELECT c_custkey AS customer_id, c_name AS customer_name, n_name AS nation_name,
         |  c_mktsegment AS mktsegment,
         |  strftime(o_orderdate, '%Y-%m-%d') AS sales_date,
         |  $totalCost AS total_cost
         |$enrichJoin""".stripMargin,

    "q11_sales_mart" ->
      s"""SELECT n_nationkey AS store_id, n_name AS store_name,
         |  s_suppkey AS sales_person_id, s_name AS sales_person_name,
         |  o_orderkey AS order_id,
         |  strftime(o_orderdate, '%Y-%m-%d') AS sales_date,
         |  $totalCost AS total_cost,
         |  strftime(o_orderdate, '%Y-%m') AS sales_month
         |$enrichJoin""".stripMargin,

    "q12_customer_monthly" ->
      s"""SELECT c_custkey AS customer_id, c_name AS full_name,
         |  strftime(o_orderdate, '%Y-%m') AS sales_month,
         |  CAST(SUM(CAST($totalCost AS DECIMAL(22,4))) AS DOUBLE) AS total_sales
         |$enrichJoin
         |GROUP BY 1, 2, 3""".stripMargin,

    "q13_sales_incentive" ->
      s"""WITH t AS (
         |  SELECT n_nationkey AS store_id, s_suppkey AS sales_person_id, s_name AS full_name,
         |    strftime(o_orderdate, '%Y-%m') AS sales_month,
         |    SUM(CAST($totalCost AS DECIMAL(22,4))) AS total_dec
         |  $enrichJoin
         |  GROUP BY 1, 2, 3, 4),
         |r AS (
         |  SELECT *, rank() OVER (PARTITION BY store_id, sales_month ORDER BY total_dec DESC) AS rnk
         |  FROM t)
         |SELECT store_id, sales_person_id, full_name, sales_month,
         |  CAST(total_dec AS DOUBLE) AS total_sales_every_month,
         |  CASE WHEN rnk = 1 THEN CAST(round(total_dec * 0.01, 2) AS DOUBLE)
         |       ELSE CAST(0 AS DOUBLE) END AS incentive
         |FROM r""".stripMargin)
}
