package graft.core

import org.apache.spark.sql.SparkSession

/** One place to build a correctly-configured session — the engine's analogue
  * of the reference's `get_spark_session` (`/root/reference/src/utils/
  * utility.py:27-49`), minus its hard-coded credentials and with the settings
  * that make results reproducible across any degree of parallelism:
  *
  *  - UTC session timezone: timestamp↔NTZ conversions (see [[Tables.events]])
  *    are wall-clock identity, and every entry point agrees with the oracle.
  *  - explicit shuffle partitions: sized by the caller to the machine (32 on
  *    the local test box, thousands on a cluster) instead of the 200 default.
  *  - AQE stays ON (Spark 4 default): runtime coalescing and skew-join
  *    splitting are part of the scale story; nothing here pins plans.
  *
  * Correctness never depends on these knobs — money aggregation is exact
  * decimal ([[Num]]) precisely so that partitioning is a pure performance
  * choice.
  */
object SessionFactory {

  def local(cores: Int, appName: String = "graft"): SparkSession =
    configure(SparkSession.builder().master(s"local[$cores]"), cores, appName)

  /** For cluster use: master/deploy config comes from spark-submit; only the
    * engine's own settings are applied.
    */
  def configure(builder: SparkSession.Builder, shufflePartitions: Int,
      appName: String): SparkSession = {
    val spark = builder
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
