package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The per-source dataset report card — the summary a corpus RELEASE ships
  * with (datasheet / dataset-card practice): volume, exact-duplicate
  * exposure, language spread, token mass, size profile. Composes the
  * engine's own primitives (md5 exact-dup families like q16, whitespace
  * token counts like q21) into one gated deliverable, so the card can never
  * drift from the operators it summarizes.
  *
  * Scale shape: one narrow (md5 → count) aggregate for global dup families
  * broadcast-joined back, everything else one map-side-combined aggregate
  * keyed by source. Integer-exact except the final IEEE division for mean
  * doc length.
  */
object ReportCard {

  def sourceReportCard(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)

    // global exact-dup families: a doc is "duplicated" if its text md5
    // appears more than once anywhere in the corpus (the q16 criterion)
    val famSizes = docs.select(md5(col("text")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("fam"))

    docs
      .withColumn("h", md5(col("text")))
      .join(broadcast(famSizes), "h")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("fam") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        count_distinct(col("lang")).as("n_langs"),
        sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("total_ws_tokens"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("mean_chars"))
  }
}
