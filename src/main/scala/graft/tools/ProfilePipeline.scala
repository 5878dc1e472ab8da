package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode
import org.apache.spark.storage.StorageLevel

import graft.core.Tables
import graft.etl.{Enrich, Marts, Metrics}
import graft.ingest.CsvBatchReader
import graft.io.{IoQueries, Jdbc, JdbcConn, ParquetSink}

/** Ad-hoc phase timer for the q33 pipeline hotspot. Not part of the driver
  * contract; mirrors IoQueries.pipelineEndToEnd but times each stage.
  */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.core.SessionFactory.local(32, "graft-profile")
    def t[A](name: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"PHASE $name%-28s ${(System.nanoTime() - s) / 1e9}%.2f s"); r
    }

    val root = IoQueries.scratch("profile", sfDir)
    IoQueries.deleteRecursively(root)
    val inputDir = s"$root/input"
    Files.createDirectories(Paths.get(inputDir))
    t("stage_csv") {
      val csvDir = graft.ops.Relational.csvCopyOfLineitem(spark, sfDir)
      new java.io.File(csvDir).listFiles().filter(_.getName.endsWith(".csv")).foreach { f =>
        Files.copy(f.toPath, Paths.get(inputDir, f.getName))
      }
    }
    val files = new java.io.File(inputDir).listFiles().map(_.getAbsolutePath).toSeq
    val load = t("validate_load") {
      CsvBatchReader.validateAndLoad(
        spark, files, Tables.lineitemSchema.fieldNames.toSeq, Some(Tables.lineitemSchema))
    }
    val fact = load.data.get
    val enriched = t("enrich_persist") {
      val e = Enrich.enrichedFromFact(
        Enrich.salesFactFrom(fact.drop(CsvBatchReader.AdditionalColumn), spark, sfDir),
        spark, sfDir).persist(StorageLevel.MEMORY_AND_DISK)
      e.count(); e
    }
    t("customer_mart_write") {
      ParquetSink.writeRunStamped(Marts.customerMartFrom(enriched), s"$root/m/c", "r1")
    }
    t("sales_mart_partitioned") {
      ParquetSink.writePartitioned(
        Marts.salesTeamMartFrom(enriched), s"$root/m/s", "r1", Seq("sales_month", "store_id"))
    }
    val cm = t("customer_metric_compute") {
      val d = Metrics.customerMonthlyFrom(enriched).persist(StorageLevel.MEMORY_AND_DISK)
      println(s"  rows=${d.count()}"); d
    }
    val inc = t("incentive_compute") {
      val d = Metrics.salesIncentiveFrom(enriched).persist(StorageLevel.MEMORY_AND_DISK)
      println(s"  rows=${d.count()}"); d
    }
    val conn = JdbcConn(s"jdbc:derby:$root/metricsdb;create=true")
    t("jdbc_write_customer") { Jdbc.write(cm, conn, "customer_monthly_purchase") }
    t("jdbc_write_incentive") { Jdbc.write(inc, conn, "sales_team_incentive") }
    t("jdbc_read_back") { println(s"  rows=${Jdbc.read(spark, conn, "customer_monthly_purchase").count()}") }
    spark.stop()
  }
}
