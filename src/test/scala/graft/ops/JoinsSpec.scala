package graft.ops

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Edge semantics of the composed as-of and range joins that the oracle's
  * bulk comparison can't isolate: strictness at equal instants, null when no
  * prior row exists, and bucket-boundary exactness.
  */
class JoinsSpec extends SparkSpec {

  test("as-of join is strict: a same-instant right row is NOT visible") {
    import spark.implicits._
    val left = Seq((1, 1L, 100L), (1, 2L, 200L), (1, 3L, 200L)).toDF("k", "id", "t")
    val right = Seq((1, 100L, "r@100"), (1, 200L, "r@200")).toDF("k", "t", "payload")
    val rows = Joins.asofJoin(left, right, "k", "k", "t", "t", Seq("payload"))
      .select("id", "asof_payload").as[(Long, Option[String])].collect().toMap
    assert(rows(1L).isEmpty)           // r@100 is same-instant, not prior
    assert(rows(2L).contains("r@100")) // strictly-before row carried forward
    assert(rows(3L).contains("r@100")) // r@200 is same-instant for both lefts
  }

  test("as-of join yields null payloads before any right row") {
    import spark.implicits._
    val left = Seq((1L, 1, 50L), (1L, 2, 500L)).toDF("k", "id", "t")
    val right = Seq((1L, 100L, "x")).toDF("k", "t", "payload")
    val rows = Joins.asofJoin(left, right, "k", "k", "t", "t", Seq("payload"))
      .select("id", "asof_payload")
      .collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(rows(1).isEmpty && rows(2).contains("x"))
  }

  test("as-of payloads are row-atomic: a null in the matched row stays null") {
    import spark.implicits._
    val left = Seq((1, 1L, 300L)).toDF("k", "id", "t")
    val right = Seq(
      (1, 100L, Some(1L), Some("x")),
      (1, 200L, Some(2L), None)) // the LATEST prior row carries b = null
      .toDF("k", "t", "a", "b")
    val row = Joins.asofJoin(left, right, "k", "k", "t", "t", Seq("a", "b"))
      .select("asof_a", "asof_b").collect().head
    assert(row.getLong(0) == 2L)
    assert(row.isNullAt(1)) // NOT "x" stitched in from the older row
  }

  test("bloom-pruned join ≡ plain join, and the probe filter prunes real rows") {
    import spark.implicits._
    val probe = (1L to 2000L).map(i => (i, s"p$i")).toDF("pk", "pv")
    val build = (1L to 2000L).filter(_ % 100 == 0).map(i => (i, s"b$i")).toDF("bk", "bv")
    val pruned = Joins.bloomPrunedJoin(probe, "pk", build, "bk", expectedKeys = 64)
      .select("pk", "pv", "bk", "bv")
    val plain = probe.join(build, col("pk") === col("bk"))
      .select("pk", "pv", "bk", "bv")
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    assert(pruned.count() == 20)
    // the reduction is real: the prefilter alone keeps the 20 true keys plus
    // at most a small false-positive tail (fpp 1% of 2000 ≈ 20), nowhere
    // near the full 2000-row probe side
    val survivors = Joins.bloomPrefilter(probe, "pk", build, "bk", 64, 0.01).count()
    assert(survivors >= 20 && survivors <= 100, s"prefilter kept $survivors of 2000")
    // plan shape on the parquet-backed q88 instantiation (a local-relation
    // probe gets its filter constant-folded into the LocalTableScan by
    // ConvertToLocalRelation, so the probe must be a real scan): the native
    // might_contain filter must sit on the probe side below the join
    val plan = Joins.urgentLineitems(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.linesIterator.take(8).mkString("\n"))
  }

  test("range join is exact at interval boundaries (lo inclusive, hi exclusive)") {
    import spark.implicits._
    val values = Seq((1L, 899.99), (2L, 900.0), (3L, 904.999), (4L, 905.0), (5L, 920.0))
      .toDF("id", "v")
    val bands = Seq((0, 900.0, 905.0), (1, 905.0, 920.0)).toDF("band_id", "lo", "hi")
    val out = Joins.bandedRangeJoin(values, "v", bands, "lo", "hi", bucket = 2.5)
      .select("id", "band_id").as[(Long, Int)].collect().toSet
    assert(out == Set((2L, 0), (3L, 0), (4L, 1))) // 899.99 below, 920.0 at excluded hi
  }
}
