package graft.io

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode

import graft.SparkSpec

/** Sink round trips: run-stamped layout, partitioned write/read equality, JDBC
  * write-then-read fidelity (error propagation is exercised implicitly — a
  * failing write throws out of Jdbc.write).
  */
class SinksSpec extends SparkSpec {

  test("writeRunStamped lands under base/runId and round-trips") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val base = tmpDir("sink")
    val path = ParquetSink.writeRunStamped(df, base, "20260101_000000")
    assert(path == s"$base/20260101_000000")
    assert(Files.exists(Paths.get(path, "_SUCCESS")))
    assert(spark.read.parquet(path).as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("partitioned sink writes one directory per key and round-trips values") {
    import spark.implicits._
    val df = Seq((1L, "2024-01", 5.0), (2L, "2024-01", 6.0), (3L, "2024-02", 7.0))
      .toDF("id", "month", "amount")
    val base = tmpDir("sinkp")
    val path = ParquetSink.writePartitioned(df, base, "r", Seq("month"))
    assert(Files.exists(Paths.get(path, "month=2024-01")))
    assert(Files.exists(Paths.get(path, "month=2024-02")))
    val back = spark.read.parquet(path)
      .select($"id", $"month".cast("string"), $"amount")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(back == Seq((1L, "2024-01", 5.0), (2L, "2024-01", 6.0), (3L, "2024-02", 7.0)))
  }

  test("JDBC write-then-read preserves rows and schema (embedded Derby)") {
    import spark.implicits._
    val df = Seq((1L, "x", 1.5), (2L, "y", -2.25)).toDF("k", "s", "d")
    val conn = JdbcConn(s"jdbc:derby:${tmpDir("derby")}/db;create=true")
    Jdbc.write(df, conn, "t", SaveMode.Overwrite)
    val back = Jdbc.read(spark, conn, "t")
    assert(back.columns.toSeq == Seq("k", "s", "d"))
    assert(back.as[(Long, String, Double)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "x", 1.5), (2L, "y", -2.25)))
  }

  test("archive moveInto uses one destination per batch and preserves names") {
    val src = tmpDir("arc_src")
    val dst = tmpDir("arc_dst")
    val f1 = Paths.get(src, "one.csv"); Files.writeString(f1, "1")
    val f2 = Paths.get(src, "two.csv"); Files.writeString(f2, "2")
    val arch = new ArchiveService(spark.sparkContext.hadoopConfiguration)
    val moved = arch.moveInto(Seq(f1.toString, f2.toString), s"$dst/run1")
    // no nested re-stamping (the reference's move.py:35-38 bug): flat under run1
    assert(Files.exists(Paths.get(dst, "run1", "one.csv")))
    assert(Files.exists(Paths.get(dst, "run1", "two.csv")))
    assert(!Files.exists(f1) && !Files.exists(f2))
    assert(moved.size == 2)
  }

  test("archive list returns only plain files, sorted") {
    val d = tmpDir("arc_list")
    Files.writeString(Paths.get(d, "b.csv"), "x")
    Files.writeString(Paths.get(d, "a.csv"), "x")
    Files.createDirectories(Paths.get(d, "subdir"))
    val arch = new ArchiveService(spark.sparkContext.hadoopConfiguration)
    val listed = arch.list(d).map(p => Paths.get(new java.net.URI(p).getPath).getFileName.toString)
    assert(listed == Seq("a.csv", "b.csv"))
    assert(arch.list(s"$d/missing").isEmpty)
  }
}
