package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway probe: is q252's window-fingerprint pass re-executed per
  * consumer (eligible + both self-join sides), or deduped by ReuseExchange?
  */
object ProbeQ252 {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SessionFactory.local(32, "graft-probe-q252")
    spark.range(1000).selectExpr("sum(id)").collect()
    def timed(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val plan = graft.ops.Dedup.substringDedup(spark, sf).queryExecution.executedPlan.toString
    val reuse = plan.linesIterator.count(_.contains("ReusedExchange"))
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    println(s"plan: $scans parquet scans, $reuse ReusedExchange nodes")
    timed("q252 as written")(graft.ops.Dedup.substringDedup(spark, sf).count())
    timed("q252 again (warm)")(graft.ops.Dedup.substringDedup(spark, sf).count())
    spark.stop()
  }
}
