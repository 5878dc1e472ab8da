package graft.ops

import graft.SparkSpec

/** SCD2 interval invariants the row-hash oracle can't state directly: per
  * customer the validity intervals TILE (each row's valid_to is exactly the
  * next row's valid_from), exactly one open interval exists, and only the open
  * interval is flagged current.
  */
class Scd2Spec extends SparkSpec {

  test("upsertLatest keeps the highest-version row per key, passes through others") {
    import spark.implicits._
    val base = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
      .toDF("id", "val", "version")
    val changes = Seq((2L, "b2", 2L), (2L, "b3", 3L), (4L, "d", 2L))
      .toDF("id", "val", "version")
    val out = Relational.upsertLatest(base, changes, Seq("id"), "version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set((1L, "a", 1L), (2L, "b3", 3L), (3L, "c", 1L), (4L, "d", 2L)))
  }

  test("scd2 intervals tile per customer with exactly one current open row") {
    val sf = "/root/testdata/sf0.001"
    val out = Relational.orderPriorityScd2(spark, sf).collect()
    assert(out.length.toLong == graft.core.Tables.orders(spark, sf).count())
    val byCust = out.groupBy(_.getAs[Long]("o_custkey"))
    assert(byCust.nonEmpty)
    byCust.foreach { case (cust, rows) =>
      // the window's order: valid_from, then o_orderkey
      val sorted = rows.sortBy(r => (String.valueOf(r.getAs[Any]("valid_from")),
        r.getAs[Long]("o_orderkey")))
      sorted.init.zip(sorted.tail).foreach { case (cur, next) =>
        assert(cur.getAs[Any]("valid_to") == next.getAs[Any]("valid_from"),
          s"gap in customer $cust history")
        assert(!cur.getAs[Boolean]("is_current"))
      }
      val last = sorted.last
      assert(last.getAs[Any]("valid_to") == null && last.getAs[Boolean]("is_current"))
      assert(sorted.count(_.getAs[Boolean]("is_current")) == 1)
    }
  }
}
