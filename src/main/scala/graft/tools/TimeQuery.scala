package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Ad-hoc single-query timing: `runMain graft.tools.TimeQuery q55_dup_clusters ...`
  * against SPARK_GRAFT_SF_DIR (default sf0.1). Complements Bench (all queries)
  * when iterating on one operator's plan.
  *
  * Runs the SAME prestage Bench does (the one-time lineitem CSV
  * materialization) before the clock starts, and drains the StagingClock per
  * query — so a solo q33 re-time is comparable to Bench's q33 number instead
  * of silently bundling cold-scratch staging that Bench reports separately.
  *
  * Besides wall time it reports per-query TASK metrics via a listener —
  * summed executor run/CPU time, shuffle bytes written and memory/disk spill.
  * On a machine with bursty neighbor contention (this round's window: wall
  * swings 3–5× between identical-code runs) `cpu=` is the noise-robust
  * before/after instrument: neighbor load inflates wall and run time but
  * barely moves our own CPU cycles, and a plan change that removes work moves
  * cpu and shuffle bytes for real.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SessionFactory.local(32, "graft-timeq")
    // task-metric accumulator, drained per query (single-threaded bench loop:
    // no attribution ambiguity; listener events for a job land before the
    // action returns only approximately, so numbers are ~exact for queries
    // that end with an action barrier — all of ours do)
    object M {
      var runMs, cpuNs, shufW, spillMem, spillDisk, tasks = 0L
      def drain(): (Long, Long, Long, Long, Long, Long) = {
        val r = (runMs, cpuNs, shufW, spillMem, spillDisk, tasks)
        runMs = 0; cpuNs = 0; shufW = 0; spillMem = 0; spillDisk = 0; tasks = 0
        r
      }
    }
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) M.synchronized {
          M.runMs += m.executorRunTime
          M.cpuNs += m.executorCpuTime
          M.shufW += m.shuffleWriteMetrics.bytesWritten
          M.spillMem += m.memoryBytesSpilled
          M.spillDisk += m.diskBytesSpilled
          M.tasks += 1
        }
      }
    })
    spark.range(1000).selectExpr("sum(id)").collect()
    try graft.ops.Relational.csvCopyOfLineitem(spark, sfDir) catch {
      case e: Throwable => println(s"TIMEQ prestage failed: ${e.getClass.getSimpleName}")
    }
    val prestage = graft.core.StagingClock.drainSeconds()
    println(f"TIMEQ prestage=$prestage%.2f s")
    M.drain()
    for (name <- args) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val stg = graft.core.StagingClock.drainSeconds()
      // listener events are posted async; give the bus a beat so the last
      // job's task-end events are counted with THIS query
      Thread.sleep(50)
      val (runMs, cpuNs, shufW, spillMem, spillDisk, tasks) = M.synchronized(M.drain())
      println(f"TIMEQ $name rows=$n time=$sec%.2f s staging=$stg%.2f s spark=${sec - stg}%.2f s " +
        f"cpu=${cpuNs / 1e9}%.2f s run=${runMs / 1e3}%.2f s tasks=$tasks " +
        f"shufW=${shufW / 1048576.0}%.1f MiB spill=${(spillMem + spillDisk) / 1048576.0}%.1f MiB")
    }
    spark.stop()
  }
}
