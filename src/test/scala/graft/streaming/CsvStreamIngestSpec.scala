package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

import graft.SparkSpec

/** The checkpoint IS the ledger: files process exactly once across drains,
  * new files process incrementally, and re-draining with nothing new is a
  * no-op — the behavior the reference hand-builds with its staging table.
  */
class CsvStreamIngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("drains are incremental and exactly-once under the checkpoint") {
    val root = tmpDir("streamingest")
    val src = s"$root/src"; Files.createDirectories(Paths.get(src))
    val out = s"$root/out"; val chk = s"$root/chk"

    Files.writeString(Paths.get(src, "batch1.csv"), "id,v\n1,a\n2,b")
    CsvStreamIngest.drain(spark, src, out, chk, schema)
    assert(spark.read.schema(schema).parquet(out).count() == 2)

    // second file arrives; first must NOT be re-read
    Files.writeString(Paths.get(src, "batch2.csv"), "id,v\n3,c")
    CsvStreamIngest.drain(spark, src, out, chk, schema)
    val after = spark.read.schema(schema).parquet(out)
    assert(after.count() == 3)
    assert(after.select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))

    // idle drain: no new files, no new rows
    CsvStreamIngest.drain(spark, src, out, chk, schema)
    assert(spark.read.schema(schema).parquet(out).count() == 3)
  }
}
