package graft.tools

import scala.collection.mutable.LinkedHashMap

/** Stage attribution for q33 (pipeline e2e) and q32 (partitioned sink
  * roundtrip) — the registry's two most expensive queries, which regressed
  * ~1.5× between the r11 and r13 clean benches with zero code changes to
  * their modules (VERDICT r13 "What's wrong" #2). Unlike q230, the pipeline
  * is inherently SEQUENTIAL (each stage is an action or a driver-side
  * effect), so the split is in-place wall timing through the `onStage` hook
  * threaded into [[graft.pipeline.SalesEtlJob.run]] /
  * [[graft.io.IoQueries]] — no re-run-the-prefix protocol needed.
  *
  * q33 stages: stage_derby_shutdown / stage_scratch_delete / stage_csv_drop /
  * stage_ledger_boot (driver staging, StagingClock-tracked in the bench) →
  * c1_inflight / c4_idempotency (ledger reads) → ingest_validate (CSV
  * header probes) → c5_ledger_start → mart_customer_write (pays the CSV
  * scan + enrich materialization) → mart_sales_partitioned_write (~2100-dir
  * tree) → metrics_jdbc_write → c7_archive → c6_ledger_complete → the final
  * JDBC read-back (timed here as `readback`). q32 stages: scratch_delete /
  * mart_partitioned_write / readback.
  *
  * Each query runs `rounds` times (default 2) — run 1 is the bench-like cold
  * number, run 2 shows what is warm-state-dependent (Derby page cache, FS
  * metadata). Prints one JSON line per run.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ProfileQ33"
  */
object ProfileQ33 {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "2").toInt
    val spark = graft.core.SessionFactory.local(cpus.toInt, "graft-profile-q33")
    spark.range(1000).selectExpr("sum(id)").collect() // JVM/codegen warmup
    // the bench prestages the lineitem CSV during warmup — match it so run-1
    // staging numbers compare like against like
    graft.ops.Relational.csvCopyOfLineitem(spark, sf)
    graft.core.StagingClock.drainSeconds()

    def osLoad = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    def profile(query: String, round: Int)(
        body: ((String, Double) => Unit) => Long): Unit = {
      val stages = LinkedHashMap.empty[String, Double]
      val onStage = (label: String, sec: Double) =>
        stages.update(label, stages.getOrElse(label, 0.0) + sec)
      val t0 = System.nanoTime()
      val n = body(onStage)
      val total = (System.nanoTime() - t0) / 1e9
      val staging = graft.core.StagingClock.drainSeconds()
      val split = stages.map { case (k, v) => f""""$k":$v%.2f""" }.mkString(",")
      println(f"""{"query":"$query","round":$round,"sf":"$sf","total_sec":$total%.2f,"staging_sec":$staging%.2f,"stages":{$split},"rows":$n,"load":$osLoad%.2f}""")
    }

    (1 to rounds).foreach { r =>
      profile("q33_pipeline_e2e", r) { onStage =>
        val df = graft.io.IoQueries.pipelineEndToEnd(spark, sf, onStage)
        val t0 = System.nanoTime()
        val n = df.count()
        onStage("readback", (System.nanoTime() - t0) / 1e9)
        n
      }
      profile("q32_sink_roundtrip", r) { onStage =>
        val df = graft.io.IoQueries.partitionedSinkRoundtrip(spark, sf, onStage)
        val t0 = System.nanoTime()
        val n = df.count()
        onStage("readback", (System.nanoTime() - t0) / 1e9)
        n
      }
    }
    spark.stop()
  }
}
