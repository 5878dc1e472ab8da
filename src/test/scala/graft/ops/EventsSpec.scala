package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The HLL sketch column of q61: correct exact counts, and the approximate
  * count within the configured relative standard deviation's practical bound
  * (4 sigma) of the exact value for every group.
  */
class EventsSpec extends SparkSpec {

  test("approx_count_distinct tracks the exact count within its error bound") {
    val rsd = 0.02
    val rows = Events.approxDistinctUsers(spark, "/root/testdata/sf0.001", rsd)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_users_exact").toDouble
      val approx = r.getAs[Long]("n_users_approx").toDouble
      assert(math.abs(approx - exact) <= math.max(4 * rsd * exact, 4.0),
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact")
    }
  }
}
