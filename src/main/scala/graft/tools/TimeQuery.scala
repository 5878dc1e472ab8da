package graft.tools

/** Ad-hoc single-query timing: `runMain graft.tools.TimeQuery q55_dup_clusters ...`
  * against SPARK_GRAFT_SF_DIR (default sf0.1). Complements Bench (all queries)
  * when iterating on one operator's plan.
  *
  * Runs the SAME prestage Bench does (the one-time lineitem CSV
  * materialization) before the clock starts, and drains the StagingClock per
  * query — so a solo q33 re-time is comparable to Bench's q33 number instead
  * of silently bundling cold-scratch staging that Bench reports separately.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SessionFactory.local(32, "graft-timeq")
    spark.range(1000).selectExpr("sum(id)").collect()
    try graft.ops.Relational.csvCopyOfLineitem(spark, sfDir) catch {
      case e: Throwable => println(s"TIMEQ prestage failed: ${e.getClass.getSimpleName}")
    }
    val prestage = graft.core.StagingClock.drainSeconds()
    println(f"TIMEQ prestage=$prestage%.2f s")
    for (name <- args) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val stg = graft.core.StagingClock.drainSeconds()
      println(f"TIMEQ $name rows=$n time=$sec%.2f s staging=$stg%.2f s spark=${sec - stg}%.2f s")
    }
    spark.stop()
  }
}
