package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The round's composed capstone (the q100/q109 pattern applied to the
  * statistical-model tier): a TRAINING-MIX MANIFEST built by running the
  * corpus through exact dedup (q16's keep-min-doc criterion), the bigram-LM
  * quality gate (q110), DSIR target affinity (q111) and the trained BPE
  * token accounting (q118), then summarizing the selected mix per source —
  * docs, subword-token budget, target-affine count. This is the artifact a
  * data-mixing run hands to the training job: every stage is an
  * already-oracle-gated operator, and the composition is hash-gated end to
  * end on top of them.
  *
  * Scale shape: pure reuse — each stage keeps its own audited plan (the BPE
  * and dedup stages ride their memoized artifacts), and the composition adds
  * only doc_id equi-joins plus one source-keyed aggregate.
  */
object TrainingMix {

  def mixManifest(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)

    // q16 criterion: one survivor per exact-text family, the smallest doc_id
    val survivors = docs
      .withColumn("h", md5(col("text")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("h")).orderBy(col("doc_id"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("source"))

    val lmKeep = LanguageModel.bigramLmScores(spark, sfDir)
      .filter(!col("below_corpus_avg"))
      .select(col("doc_id"))

    val affinity = LanguageModel.importanceWeights(spark, sfDir)
      .select(col("doc_id"), col("target_like"))

    val tokens = Bpe.bpeTokenCounts(spark, sfDir)
      .select(col("doc_id"), col("n_subword_tokens"))

    survivors
      .join(lmKeep, "doc_id")
      .join(affinity, "doc_id")
      .join(tokens, "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_subword_tokens")).as("total_subword_tokens"),
        sum(when(col("target_like"), 1L).otherwise(0L)).as("n_target_like"))
  }
}
