package graft.ops

import graft.SparkSpec

/** The q134 contract, cross-checked Spark-vs-Spark (the oracle gate proves
  * it cross-engine): the incrementally maintained join view — standing term
  * plus three delta-join terms, merged via decimal partials — is exactly the
  * from-scratch join view, including customers whose rows arrive entirely
  * through a delta side.
  */
class ViewMaintenanceSpec extends SparkSpec {

  test("delta-join maintenance reproduces the from-scratch join view exactly") {
    val sf = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3), r.getLong(4))
    val incr = ViewMaintenance.incrementalJoinView(spark, sf)
      .collect().map(key).sortBy(_._1)
    val scratch = ViewMaintenance.fromScratchJoinView(spark, sf)
      .collect().map(key).sortBy(_._1)
    assert(incr.length === scratch.length)
    assert(incr.toSeq === scratch.toSeq)
  }

  test("every delta term contributes: cut and dim-slice both split non-trivially") {
    // degenerate splits would let the identity pass while testing nothing —
    // pin that all four quadrants of the delta-join matrix are non-empty
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val orders = graft.core.Tables.orders(spark, sf)
    val customer = graft.core.Tables.customer(spark, sf)
    val cutTs = lit("1997-01-01").cast("timestamp_ntz")
    assert(orders.filter(col("o_orderdate") < cutTs).limit(1).count() === 1L)
    assert(orders.filter(col("o_orderdate") >= cutTs).limit(1).count() === 1L)
    assert(customer.filter(pmod(col("c_custkey"), lit(4)) === 0).limit(1).count() === 1L)
    assert(customer.filter(pmod(col("c_custkey"), lit(4)) =!= 0).limit(1).count() === 1L)
  }
}
