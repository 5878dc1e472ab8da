package graft.io

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Log-protocol invariants the oracle gate can't see: copy-on-write file
  * pruning (untouched groups carry over BY REFERENCE), time travel across a
  * destructive commit, change-feed minimality, and history accounting.
  */
class VersionedTableSpec extends SparkSpec {

  test("append/snapshot round-trips and versions are immutable under later commits") {
    import spark.implicits._
    val base = tmpDir("vt_basic")
    val v0 = VersionedTable.append(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), base)
    val v1 = VersionedTable.append(Seq((3L, "c")).toDF("k", "s"), base)
    assert(v0 === 0 && v1 === 1)
    assert(VersionedTable.snapshot(spark, base, 0).collect().map(_.getLong(0)).sorted
      === Array(1L, 2L))
    assert(VersionedTable.snapshot(spark, base).collect().map(_.getLong(0)).sorted
      === Array(1L, 2L, 3L))
    // deleting k=1 must not change what version 0 reads (time travel)
    VersionedTable.deleteWhere(spark, base, col("k") === 1L)
    assert(VersionedTable.snapshot(spark, base, 0).collect().map(_.getLong(0)).sorted
      === Array(1L, 2L), "old version still sees the deleted row")
    assert(VersionedTable.snapshot(spark, base).collect().map(_.getLong(0)).sorted
      === Array(2L, 3L))
  }

  test("copy-on-write delete rewrites ONLY groups containing matches") {
    import spark.implicits._
    val base = tmpDir("vt_cow")
    VersionedTable.append(Seq((1L, "x"), (2L, "x")).toDF("k", "s"), base)   // g00000-0
    VersionedTable.append(Seq((10L, "y"), (11L, "y")).toDF("k", "s"), base) // g00001-0
    VersionedTable.deleteWhere(spark, base, col("k") === 10L)
    val hist = VersionedTable.history(spark, base).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(hist.toSeq === Seq(
      (0L, "append", 1L, 0L),
      (1L, "append", 1L, 0L),
      (2L, "delete", 1L, 1L)), "exactly one group rewritten, one removed")
    // the untouched first group is still live by its ORIGINAL identity
    val live = VersionedTable.snapshot(spark, base)
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(live.exists(_.contains("/groups/g00000-0/")),
      "group untouched by the predicate carries over by reference")
    assert(!live.exists(_.contains("/groups/g00001-0/")),
      "touched group is replaced by its rewrite")
  }

  test("delete matching nothing commits a no-op version, not a rewrite") {
    import spark.implicits._
    val base = tmpDir("vt_noop")
    VersionedTable.append(Seq((1L, "x")).toDF("k", "s"), base)
    VersionedTable.deleteWhere(spark, base, col("k") === 99L)
    val hist = VersionedTable.history(spark, base).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(hist.toSeq === Seq(("append", 1L, 0L), ("delete_noop", 0L, 0L)))
  }

  test("change feed reports only genuine inserts/deletes, with bag semantics") {
    import spark.implicits._
    val base = tmpDir("vt_cdf")
    // duplicate row (1,"dup") twice: bag semantics must count copies
    VersionedTable.append(Seq((1L, "dup"), (1L, "dup"), (2L, "keep")).toDF("k", "s"), base)
    VersionedTable.deleteWhere(spark, base, col("k") === 1L)          // v1: CoW rewrite
    VersionedTable.append(Seq((3L, "new")).toDF("k", "s"), base)      // v2
    val changes = VersionedTable.changesBetween(spark, base, 0, 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(changes.toSeq === Seq(
      (1L, "dup", "delete"), (1L, "dup", "delete"), (3L, "new", "insert")),
      "carried-over row (2,keep) absent; both copies of the dup deleted")
  }

  test("a torn manifest write is invisible: only atomically moved manifests count") {
    import spark.implicits._
    val base = tmpDir("vt_torn")
    VersionedTable.append(Seq((1L, "a")).toDF("k", "s"), base)
    // simulate a writer that crashed between temp-write and atomic move
    Files.write(Paths.get(base, "_log", ".v00001.txt.tmp"),
      "action append\nadd groups/ghost\n".getBytes("UTF-8"))
    assert(VersionedTable.latestVersion(base) === 0, "tmp manifest is not a version")
    assert(VersionedTable.snapshot(spark, base).count() === 1L)
  }
}
