package graft.ops

import graft.SparkSpec

/** Layout invariants of the compaction operator: the file count lands on the
  * byte-budget plan, every row survives, and the rewrite shuffles nothing
  * (coalesce keeps it a partition merge).
  */
class CompactionSpec extends SparkSpec {

  test("compaction hits the planned file count and loses nothing") {
    import spark.implicits._
    val root = tmpDir("compactspec")
    val src = s"$root/src"
    (1L to 10000L).toDF("id").repartition(20)
      .write.mode("overwrite").parquet(src)
    assert(Compaction.dataFiles(spark, src).size === 20)

    val total = Compaction.dataFiles(spark, src).map(_._2).sum
    val bins = Compaction.compact(spark, src, s"$root/out", targetBytes = total / 4)
    val outFiles = Compaction.dataFiles(spark, s"$root/out")
    assert(bins === 5, "ceil(total / (total/4)) with remainder = 5 bins")
    assert(outFiles.size <= bins && outFiles.nonEmpty,
      "bin count bounds the output files (the scan may pack tighter)")
    assert(outFiles.size < 20, "compaction reduced the file count")

    val out = spark.read.parquet(s"$root/out")
    assert(out.count() === 10000L)
    assert(out.exceptAll(spark.read.parquet(src)).isEmpty)
    assert(spark.read.parquet(src).exceptAll(out).isEmpty)
  }

  test("the compaction rewrite plan has no exchange") {
    import spark.implicits._
    val root = tmpDir("compactplan")
    val src = s"$root/src"
    (1L to 1000L).toDF("id").repartition(8).write.mode("overwrite").parquet(src)
    val plan = spark.read.parquet(src).coalesce(2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"coalesce must not shuffle:\n$plan")
  }
}
