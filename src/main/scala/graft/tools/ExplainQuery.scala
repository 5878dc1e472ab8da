package graft.tools

/** Plan capture for the optimization rounds: `runMain graft.tools.ExplainQuery
  * <outDir> <query>...` writes each named query's `.explain("formatted")`
  * output to `<outDir>/<name>.txt` against SPARK_GRAFT_SF_DIR (default
  * sf0.1). Used to commit before/after plan evidence under plans/<round>/
  * so plan-shape claims (Exchange count, join strategy, PushedFilters) are
  * checkable without running Spark.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val outDir = args.head
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SessionFactory.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-explain")
    new java.io.File(outDir).mkdirs()
    for (name <- args.tail) {
      val plan =
        try graft.SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable =>
          s"EXPLAIN FAILED: ${e.getClass.getName}: ${e.getMessage}"
        }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/$name.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[explain] wrote $outDir/$name.txt")
    }
    spark.stop()
  }
}
