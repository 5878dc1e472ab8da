package graft.ops

import graft.SparkSpec

/** The quantile sketch of q71: approx_percentile must land within the
  * Greenwald-Khanna rank-error bound of the exact percentile. With accuracy
  * a, rank error is n/a; translated to values we assert the approx value
  * falls between the exact percentiles at p ± 4/a.
  */
class RelationalSketchSpec extends SparkSpec {

  test("approx_percentile tracks exact percentiles within its rank bound") {
    val sf = "/root/testdata/sf0.01"
    val acc = 10000
    val eps = 4.0 / acc
    val li = graft.core.Tables.lineitem(spark, sf)
    for (p <- Seq(0.5, 0.95)) {
      val rows = li.groupBy("l_returnflag")
        .agg(
          org.apache.spark.sql.functions.expr(
            s"percentile(l_extendedprice, ${math.max(0.0, p - eps)})").as("lo"),
          org.apache.spark.sql.functions.expr(
            s"percentile(l_extendedprice, ${math.min(1.0, p + eps)})").as("hi"),
          org.apache.spark.sql.functions.expr(
            s"approx_percentile(l_extendedprice, $p, $acc)").as("approx"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (lo, hi, ap) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
        assert(ap >= lo && ap <= hi,
          s"p=$p flag=${r.getString(0)}: approx=$ap outside [$lo, $hi]")
      }
    }
  }
}
