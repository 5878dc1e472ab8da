package graft.tools

/** Ad-hoc single-query correctness dump: `runMain graft.tools.VerifyOne
  * <outDir> <query>...` writes each named query's result under
  * `<outDir>/<name>` (parquet) against SPARK_GRAFT_SF_DIR (default sf0.01),
  * mirroring [[graft.Verify]] for a subset — so a new operator's DuckDB
  * oracle can be checked locally without paying the full 85-query dump.
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val outDir = args.head
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.core.SessionFactory.local(8, "graft-verify-one")
    for (name <- args.tail)
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    spark.stop()
  }
}
