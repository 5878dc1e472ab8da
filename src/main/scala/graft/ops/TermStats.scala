package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Corpus-level term statistics — the vocabulary/IDF side of a training-data
  * pipeline (complementing the per-document stats in [[TextAnalysis]]).
  *
  * Scale design: these are the heaviest legitimate shuffles in the corpus
  * suite — token explosion multiplies rows ~100×. Both operators aggregate
  * BEFORE anything wide: the explode feeds straight into a partial
  * (map-side-combined) hash aggregate keyed by term, so the exchange carries
  * one row per distinct (group, term), never per token occurrence. Top-k uses
  * a per-group window AFTER aggregation (|vocab| rows, not |tokens|), with a
  * fully deterministic tie order.
  */
object TermStats {

  private def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  /** Top-`k` terms per language by occurrence count. Ties are broken
    * lexicographically, so row_number is deterministic.
    */
  def topTermsPerLang(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    val counts = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("n_occurrences"))
    counts
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(col("n_occurrences").desc, col("term"))).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Per-language term frequencies through the native Misra-Gries
    * heavy-hitters aggregate ([[graft.functions.HeavyHittersAgg]]) — the
    * frequent-items member of the mergeable-sketch family beside HLL (q61)
    * and GK quantiles (q71). Each map partition reduces to ≤ `k` counters
    * before the exchange, so the shuffle carries constant bytes per language
    * where the exact `GROUP BY term` shape shuffles one row per distinct
    * (lang, term).
    *
    * Oracle-gated EXACTLY (not rows-only): with `k` ≥ the corpus vocabulary
    * (31 terms/lang in the synthetic corpus at every scale factor) the
    * summary never evicts and Misra-Gries degenerates to exact counting, so
    * the result is bit-identical to the GROUP BY — the gate proves the whole
    * update/serialize/merge/eval path end to end. The eviction path (k <
    * vocab) is pinned by `HeavyHittersAggSpec` instead: never overcounts,
    * undercounts ≤ n/(k+1), and every item above that threshold survives.
    */
  def heavyTermsPerLang(spark: SparkSession, sfDir: String, k: Int = 64): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("lang"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("lang"))
      .agg(graft.functions.HeavyHittersAgg(col("term"), k).as("hh"))
      .select(col("lang"), explode(col("hh")).as("e"))
      .select(col("lang"), col("e.term").as("term"), col("e.est_count").as("est_count"))

  /** Top-`k` TF-IDF terms per document. tf = occurrences in the doc, df =
    * documents containing the term, score = tf · N / df — the log-free
    * rational form so every value is an exact-int product and one IEEE
    * division (ln() differs in final ulps across engines; tf·N/df ranks
    * identically for fixed N and is bit-reproducible).
    *
    * Two aggregates (per-doc tf, per-term df) + one equi-join on term. The
    * document count N enters as a broadcast one-row cross join, not a
    * driver-side collect.
    */
  def tfidfTopTerms(spark: SparkSession, sfDir: String, k: Int = 3): DataFrame = {
    val docTerms = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
    val tf = docTerms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = docTerms.distinct().groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, sfDir).agg(count(lit(1)).as("n_docs"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * col("n_docs") / col("df"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"), col("rnk"))
  }
}
