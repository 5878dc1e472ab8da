package graft.tools

import org.apache.spark.sql.streaming.StreamingQueryListener

/** One-off profiler for the AvailableNow drains (q60/q94): registers a
  * streaming listener, runs the named queries, and prints per-batch timing
  * (batchId, numInputRows, durationMs breakdown) so "drain is slow" can be
  * attributed to batch COUNT vs per-batch cost. Not part of the driver
  * contract; profiling only.
  */
object DrainProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SessionFactory.local(32, "graft-drainprof")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"PROF started ${e.name}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"PROF batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
        p.stateOperators.foreach { so =>
          println(s"PROF   state op=${so.operatorName} rowsTotal=${so.numRowsTotal} " +
            s"updated=${so.numRowsUpdated} updMs=${so.allUpdatesTimeMs} " +
            s"rmMs=${so.allRemovalsTimeMs} commitMs=${so.commitTimeMs} " +
            s"memUsed=${so.memoryUsedBytes}")
        }
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"PROF terminated")
    })
    spark.range(1000).selectExpr("sum(id)").collect()
    sys.env.get("PROF_SHUFFLE").foreach(n => spark.conf.set("spark.sql.shuffle.partitions", n))
    sys.env.get("PROF_CKPT").foreach(d => spark.conf.set("spark.sql.streaming.checkpointLocation", d))
    for (name <- args) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      println(f"PROF $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
