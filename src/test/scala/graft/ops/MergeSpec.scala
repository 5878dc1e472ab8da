package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MERGE INTO contracts: clause semantics and ordering, the Delta-style
  * cardinality violation, condition-gated inserts, and the deletion-vector
  * reconstruction identity (target ∖ dv ∪ appends ≡ merged).
  */
class MergeSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def target: DataFrame = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "bal")
  }

  test("three clauses apply: delete, conditional update, conditional insert") {
    import spark.implicits._
    val source = Seq(
      (1L, "del", 0.0),     // matched + delete op → row 1 gone
      (2L, "upd", 5.0),     // matched + upsert op → bal 20+5, name kept
      (5L, "upd", 50.0),    // unmatched + upsert op → inserted
      (6L, "del", 60.0))    // unmatched + delete op → insert condition fails, dropped
      .toDF("k", "op", "amount")
    val merged = Merge.mergeInto(target, source, Seq("k"),
      deleteWhen = Some(col("s.op") === "del"),
      updateWhen = Some(col("s.op") === "upd"),
      updateSet = Map("bal" -> (col("t.bal") + col("s.amount"))),
      insertWhen = Some(col("s.op") === "upd"),
      insertValues = Map("name" -> lit("new"), "bal" -> col("s.amount")))
    val rows = merged.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.toSeq == Seq(
      (2L, "b", 25.0), (3L, "c", 30.0), (4L, "d", 40.0), (5L, "new", 50.0)))
  }

  test("delete-before-update clause order: a row matching both conditions is deleted") {
    import spark.implicits._
    val source = Seq((2L, 99.0)).toDF("k", "amount")
    val merged = Merge.mergeInto(target, source, Seq("k"),
      deleteWhen = Some(col("s.amount") > 50),
      updateWhen = Some(col("s.amount") > 0),
      updateSet = Map("bal" -> col("s.amount")))
    assert(merged.filter(col("k") === 2L).isEmpty)
    assert(merged.count() == 3)
  }

  test("a target row matched by two source rows raises the cardinality violation") {
    import spark.implicits._
    val source = Seq((2L, 1.0), (2L, 2.0)).toDF("k", "amount")
    val merged = Merge.mergeInto(target, source, Seq("k"),
      updateWhen = Some(lit(true)),
      updateSet = Map("bal" -> col("s.amount")))
    val e = intercept[Exception](merged.collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("cardinality violation")))
  }

  test("a duplicate-key target updated by ONE source row per key is NOT a violation") {
    import spark.implicits._
    // Delta semantics: one source row may update several target rows; the
    // guard fires only when a target row is matched by >1 SOURCE rows.
    val dupTarget = Seq((1L, "a", 10.0), (1L, "a2", 11.0), (2L, "b", 20.0))
      .toDF("k", "name", "bal")
    val source = Seq((1L, 5.0)).toDF("k", "amount")
    val merged = Merge.mergeInto(dupTarget, source, Seq("k"),
      updateWhen = Some(lit(true)),
      updateSet = Map("bal" -> (col("t.bal") + col("s.amount"))))
    val rows = merged.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2))
    assert(rows.toSeq == Seq((1L, "a", 15.0), (1L, "a2", 16.0), (2L, "b", 20.0)))
  }

  test("deletion-vector flavor raises the same cardinality violation as mergeInto") {
    import spark.implicits._
    val source = Seq((2L, 1.0), (2L, 2.0)).toDF("k", "amount")
    val (dv, appends) = Merge.mergeDeletionVector(target, source, Seq("k"),
      updateWhen = Some(lit(true)),
      updateSet = Map("bal" -> col("s.amount")))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e1 = intercept[Exception](dv.collect())
    assert(msgs(e1).exists(_.contains("cardinality violation")))
    val e2 = intercept[Exception](appends.collect())
    assert(msgs(e2).exists(_.contains("cardinality violation")))
  }

  test("deletion-vector flavor reconstructs exactly the merged relation") {
    import spark.implicits._
    val source = Seq(
      (1L, "del", 0.0), (2L, "upd", 5.0), (5L, "upd", 50.0))
      .toDF("k", "op", "amount")
    def clauses = (Some(col("s.op") === "del"), Some(col("s.op") === "upd"),
      Map("bal" -> (col("t.bal") + col("s.amount"))),
      Some(col("s.op") === "upd"),
      Map("name" -> lit("new"), "bal" -> col("s.amount")))
    val (dw, uw, us, iw, iv) = clauses
    val merged = Merge.mergeInto(target, source, Seq("k"), dw, uw, us, iw, iv)
    val (dv, appends) = Merge.mergeDeletionVector(target, source, Seq("k"), dw, uw, us, iw, iv)
    // dv = deleted row 1 + superseded row 2; appends = new image of 2 + insert 5
    assert(dv.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val rebuilt = target.join(dv, Seq("k"), "left_anti").unionByName(appends)
    assert(rebuilt.exceptAll(merged).isEmpty && merged.exceptAll(rebuilt).isEmpty)
  }

  test("tableDiff: all three classes detected, identical rows omitted, NULLs compare null-safely") {
    import spark.implicits._
    val left = Seq(
      (1L, Some("a"), 1.0), (2L, Some("b"), 2.0), (3L, Some("c"), 3.0),
      (4L, None: Option[String], 4.0)).toDF("k", "s", "x")
    val right = Seq(
      (1L, Some("a"), 1.0),                       // identical → omitted
      (2L, Some("B"), 2.0),                       // changed
      (4L, None: Option[String], 4.0),            // identical w/ NULL → omitted
      (5L, Some("e"), 5.0)).toDF("k", "s", "x")   // extra in right
    val diff = Merge.tableDiff(left, right, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff === Map(2L -> "changed", 3L -> "missing_in_right",
      5L -> "missing_in_left"))
    val err = intercept[IllegalArgumentException] {
      Merge.tableDiff(left, right.withColumnRenamed("x", "y"), Seq("k"))
    }
    assert(err.getMessage.contains("identical schemas"))
  }
}
