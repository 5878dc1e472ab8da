package graft.etl

import org.apache.spark.sql.Row

import graft.SparkSpec

/** The incentive semantics the reference encodes in code (not prose):
  * `rank()` ties at the top of a (store, month) ALL get the 1% incentive
  * (`/root/reference/src/transform/transform.py:150-153`), money rounds
  * HALF_UP to 2 decimals (`transform.py:154`), and the idiomatic groupBy
  * form must agree with the reference-shaped window+distinct form.
  */
class MetricsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("rank ties: every argmax salesperson in a (store, month) earns the incentive") {
    import spark.implicits._
    // two suppliers tied at 100.00, one behind — built as an enriched micro-fixture
    val enriched = Seq(
      // (custkey, name, nationkey, suppkey, sname, orderdate, extendedprice, discount)
      (1L, "ca", 7, 11L, "alice", "2024-01-05", 100.0, 0.0),
      (2L, "cb", 7, 12L, "bob",   "2024-01-09", 100.0, 0.0),
      (3L, "cc", 7, 13L, "carol", "2024-01-11",  40.0, 0.0))
      .toDF("c_custkey", "c_name", "n_nationkey", "s_suppkey", "s_name",
        "o_orderdate_s", "l_extendedprice", "l_discount")
      .withColumn("o_orderdate",
        org.apache.spark.sql.functions.to_timestamp($"o_orderdate_s"))
    val out = Metrics.salesIncentiveFrom(enriched)
      .select("full_name", "incentive").collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out("alice") == 1.0) // both tied winners get 1% of 100.00
    assert(out("bob") == 1.0)
    assert(out("carol") == 0.0) // rank 3 (rank, not row_number: no rank-2 exists)
  }

  test("incentive rounds half-up in the decimal domain") {
    import spark.implicits._
    // 100.125 total → 1% = 1.00125 → 2dp HALF_UP = 1.0; 100.555 → 1.00555 → 1.01
    val enriched = Seq(
      (1L, "ca", 7, 11L, "alice", "2024-01-05", 100.125, 0.0),
      (2L, "cb", 8, 12L, "bob",   "2024-01-09", 101.555, 0.0))
      .toDF("c_custkey", "c_name", "n_nationkey", "s_suppkey", "s_name",
        "o_orderdate_s", "l_extendedprice", "l_discount")
      .withColumn("o_orderdate",
        org.apache.spark.sql.functions.to_timestamp($"o_orderdate_s"))
    val out = Metrics.salesIncentiveFrom(enriched)
      .select("full_name", "incentive").collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out("alice") == 1.0)
    assert(out("bob") == 1.02) // 1.01555 → 1.02
  }

  test("bitCompat (window+distinct) ≡ idiomatic (groupBy) customer monthly on sf0.001") {
    val idiomatic = Metrics.customerMonthly(spark, sf)
    val bitCompat = Metrics.customerMonthlyBitCompat(spark, sf)
    assert(idiomatic.count() == bitCompat.count())
    assert(idiomatic.exceptAll(bitCompat).isEmpty && bitCompat.exceptAll(idiomatic).isEmpty)
  }

  test("incentive output schema is the engine contract") {
    val cols = Metrics.salesIncentive(spark, sf).columns.toSeq
    assert(cols == Seq("store_id", "sales_person_id", "full_name", "sales_month",
      "total_sales_every_month", "incentive"))
  }
}
