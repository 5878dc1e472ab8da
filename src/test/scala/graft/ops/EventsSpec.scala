package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The HLL sketch column of q61: correct exact counts, and the approximate
  * count within the configured relative standard deviation's practical bound
  * (4 sigma) of the exact value for every group.
  */
class EventsSpec extends SparkSpec {

  test("sessionPaths enumerates every session's events, one path entry per event") {
    val sf = "/root/testdata/sf0.001"
    val paths = Events.sessionPaths(spark, sf)
    // every event appears in exactly one path entry
    assert(paths.agg(sum(col("n_events"))).head.getLong(0) ==
      graft.core.Tables.events(spark, sf).count())
    // path length is the event count for every session
    assert(paths.filter(size(split(col("path"), ">")) =!= col("n_events")).isEmpty)
    // sessions are exactly sessionize's sessions with identical event counts
    val bySession = Events.sessionize(spark, sf)
      .select(col("user_id"), col("session_seq"), col("n_events"))
    assert(paths.select(col("user_id"), col("session_seq"), col("n_events"))
      .exceptAll(bySession).isEmpty)
    assert(bySession.exceptAll(
      paths.select(col("user_id"), col("session_seq"), col("n_events"))).isEmpty)
  }

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
