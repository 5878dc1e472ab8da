package graft.tools

/** Ad-hoc single-query timing: `runMain graft.tools.TimeQuery q55_dup_clusters ...`
  * against SPARK_GRAFT_SF_DIR (default sf0.1). Complements Bench (all queries)
  * when iterating on one operator's plan.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SessionFactory.local(32, "graft-timeq")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (name <- args) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIMEQ $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
