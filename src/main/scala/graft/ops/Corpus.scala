package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Corpus curation: the composition the individual LLM-pipeline operators
  * exist for — produce the training-ready document manifest by chaining
  * exact-dedup survivorship, length bounds, and quality scoring in ONE pass.
  *
  * Shuffle budget: a single exchange, on the content fingerprint (for the
  * survivor window). Quality metrics are per-row expressions computed before
  * the shuffle and carried through; no second join against a dedup table —
  * the window formulation keeps the whole filter at one shuffle where the
  * naive survivors-join costs an aggregate plus a join.
  */
object Corpus {

  /** Training-set manifest: exact-dedup survivors (lowest doc_id per content
    * fingerprint) within length bounds above a quality floor.
    */
  def trainingFilter(spark: SparkSession, sfDir: String,
      minChars: Int = 50, maxChars: Int = 100000,
      minQuality: Double = 0.05): DataFrame = {
    val byFingerprint = Window
      .partitionBy(md5(TextAnalysis.normText(col("text"))))
      .orderBy(col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        TextAnalysis.qualityTokens.cast("long").as("n_tokens"),
        TextAnalysis.qualityScore.as("quality_score"),
        row_number().over(byFingerprint).as("rn"))
      .filter(col("rn") === 1 &&
        col("n_chars").between(minChars, maxChars) &&
        col("quality_score") >= minQuality)
      .drop("rn")
  }
}
