package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference has no streaming (its
  * "incremental" behavior is the file-granularity staging ledger,
  * `/root/reference/src/staging/staging.py` — SURVEY §2.9); this module is the
  * Spark-native subsumption: `readStream` over a drop directory with
  * `Trigger.AvailableNow` gives exactly-once file-granularity micro-batching
  * with checkpoint-based recovery, replacing the hand-rolled MySQL ledger for
  * the streaming-shaped half of the problem.
  */
object EventStream {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming tumbling-hour rollup, run to completion over whatever is in the
    * directory (AvailableNow) and returned as a batch DataFrame. Semantics match
    * [[graft.ops.Events.hourlyRollup]] — the batch query is the oracle contract
    * for this streaming one.
    */
  def hourlyRollupAvailableNow(spark: SparkSession, sfDir: String): DataFrame = {
    val stream = spark.readStream
      .schema(eventsSchema)
      .parquet(s"$sfDir/events.parquet")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
    val name = s"graft_stream_hourly_${System.nanoTime()}"
    val q = stream.writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).select(
      col("window.start").as("hour"),
      col("event_type"), col("n_events"), col("total_value"))
  }
}
