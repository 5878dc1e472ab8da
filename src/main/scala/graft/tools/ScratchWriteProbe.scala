package graft.tools

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col

/** Throwaway probe for the partitioned-write cost (q32/q33 attribution). */
object ScratchWriteProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.SessionFactory.local(32, "graft-write-probe")
    spark.range(1000).selectExpr("sum(id)").collect()
    val mart = graft.etl.Marts.salesTeamMart(spark, sf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"mart rows: ${mart.count()}")
    println("distinct (month, store): " + mart.select("sales_month", "store_id").distinct().count())
    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val base = "/root/repo/target/tmp/write_probe"
    graft.io.VersionedTable.deleteDir(java.nio.file.Paths.get(base))
    val n = spark.sessionState.conf.numShufflePartitions
    timed("plain unpartitioned write") {
      mart.write.mode(SaveMode.Overwrite).parquet(s"$base/plain")
    }
    timed("partitioned, repartition(32, cols) [current]") {
      mart.repartition(n, Seq("sales_month", "store_id").map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .partitionBy("sales_month", "store_id").parquet(s"$base/p32")
    }
    timed("partitioned, repartition(32, cols), committer v2") {
      spark.sparkContext.hadoopConfiguration
        .setInt("mapreduce.fileoutputcommitter.algorithm.version", 2)
      mart.repartition(n, Seq("sales_month", "store_id").map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .partitionBy("sales_month", "store_id").parquet(s"$base/p32v2")
      spark.sparkContext.hadoopConfiguration
        .setInt("mapreduce.fileoutputcommitter.algorithm.version", 1)
    }
    timed("partitioned, repartition(32, cols) again [v1, warm]") {
      mart.repartition(n, Seq("sales_month", "store_id").map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .partitionBy("sales_month", "store_id").parquet(s"$base/p32b")
    }
    timed("partitioned, repartition(256, cols)") {
      mart.repartition(256, Seq("sales_month", "store_id").map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .partitionBy("sales_month", "store_id").parquet(s"$base/p256")
    }
    // listener: task-time sum + max per stage → is the wall time in executor
    // tasks at all, or in driver-side commit between job end and return?
    val stageInfo = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {s <- si.submissionTime; e <- si.completionTime} yield e - s
        stageInfo.put(si.stageId, (dur.getOrElse(-1L), si.taskMetrics.executorRunTime, si.numTasks))
      }
    })
    timed("partitioned, repartition(32, cols) [listener run]") {
      mart.repartition(n, Seq("sales_month", "store_id").map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .partitionBy("sales_month", "store_id").parquet(s"$base/plisten")
    }
    stageInfo.forEach { (id, v) =>
      println(f"  stage $id: wall ${v._1 / 1e3}%.2f s, executorRunTime sum ${v._2 / 1e3}%.2f s, ${v._3} tasks")
    }
    // poor-man's sampler: aggregate executor-thread stack frames during one
    // partitioned write to locate the 130ms-CPU-per-file-open hot spot
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        Thread.getAllStackTraces.forEach { (t, st) =>
          if (t.getName.startsWith("Executor task launch") && st.nonEmpty) {
            val key = st.take(12).mkString(" <- ")
            samples.merge(key, 1, (a, b) => a + b)
          }
        }
        Thread.sleep(20)
      }
    })
    sampler.start()
    timed("partitioned, repartition(32, cols) [sampled]") {
      mart.repartition(n, Seq("sales_month", "store_id").map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .partitionBy("sales_month", "store_id").parquet(s"$base/psampled")
    }
    sampling = false
    sampler.join()
    import scala.jdk.CollectionConverters._
    println("top sampled stacks:")
    samples.asScala.toSeq.sortBy(-_._2).take(8).foreach { case (k, c) =>
      println(s"  [$c] $k")
    }
    timed("partitioned CSV, repartition(32, cols)") {
      mart.repartition(n, Seq("sales_month", "store_id").map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .partitionBy("sales_month", "store_id").csv(s"$base/csv32")
    }
    timed("partitioned parquet UNCOMPRESSED, repartition(32, cols)") {
      mart.repartition(n, Seq("sales_month", "store_id").map(col): _*)
        .write.mode(SaveMode.Overwrite).option("compression", "none")
        .partitionBy("sales_month", "store_id").parquet(s"$base/pnone")
    }
    timed("partitioned parquet, concurrent writers 64 (no sort)") {
      spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", 64)
      mart.repartition(n, Seq("sales_month", "store_id").map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .partitionBy("sales_month", "store_id").parquet(s"$base/pconc")
      spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", 0)
    }
    println("file counts:")
    Seq("plain", "p32", "p32v2", "p32b", "p256", "csv32", "pnone", "pconc").foreach { d =>
      val c = new java.io.File(s"$base/$d").toPath
      val files = java.nio.file.Files.walk(c).filter(p => p.toString.endsWith(".parquet")).count()
      println(s"  $d: $files parquet files")
    }
    spark.stop()
  }
}
