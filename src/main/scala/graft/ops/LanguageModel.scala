package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Statistical language-model scoring over the document corpus — the
  * "perplexity filtering" stage of an LLM training-data pipeline (CCNet /
  * Gopher / RefinedWeb all gate on an n-gram LM score; the reference has no
  * LM tier, this extends its curation surface).
  *
  * The model is a corpus-trained add-one-smoothed bigram LM. Production
  * pipelines score docs by average log-probability; `ln()` differs in final
  * ulps across engines, so — exactly like q57's log-free TF-IDF — the
  * oracle-gated form works in an EXACT fixed-point domain instead:
  *
  *   p_ppm(w2|w1) = ((c(w1 w2) + 1) * SCALE) div (c(w1 ·) + V)
  *
  * Every quantity is an exact integer (counts, vocabulary size, floored
  * scaled division — Spark `div` and DuckDB `//` agree on non-negative
  * longs), per-doc totals are exact integer sums (associative, order-free),
  * and the single IEEE division at the end (`ppm_sum / n_bigrams`) is
  * bit-reproducible. The arithmetic-mean-of-probabilities differs from the
  * geometric mean perplexity uses, but ranks low-likelihood docs the same
  * way for a fixed model and is exactly gateable.
  *
  * Scale design (100 TB): the exploded bigram stream is pre-aggregated to
  * (doc_id, bigram, n) in the SAME map-side-combined aggregate that feeds
  * everything downstream, so the model-count shuffles carry one row per
  * distinct key, never per token occurrence. Model tables (c12 keyed by
  * bigram, c1 keyed by first word) are |vocab|²-bounded aggregates; V and
  * the corpus mean enter as broadcast one-row frames, never a driver
  * collect. Long range: c12 ≤ corpus bigram count B; (c12+1)·10⁶ overflows
  * only past B ≈ 9.2·10¹² bigrams (~few hundred TB of text) — past that,
  * lift SCALE work into DECIMAL(38,0).
  */
object LanguageModel {

  private val Scale = 1000000L // parts-per-million fixed point

  private def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  /** Adjacent-token bigrams, space-joined. Empty (never null) below 2 tokens
    * — `sequence(1, n)` REVERSES for n < 1, so the guard is load-bearing.
    */
  private def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Per-document bigram-LM scores with a corpus-relative filter flag.
    *
    * Output: (doc_id, n_bigrams, ppm_sum, avg_ppm, below_corpus_avg) —
    * `avg_ppm` is the doc's mean smoothed bigram probability in ppm;
    * `below_corpus_avg` marks docs scoring under the corpus-wide mean (the
    * would-be-filtered slice). Docs with < 2 tokens surface with
    * n_bigrams = 0 and null score, never silently dropped.
    */
  def bigramLmScores(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))

    // One explode, immediately reduced: (doc_id, bigram, n) — the only
    // per-occurrence-width stage, and it combines map-side.
    val docBigrams = docs
      .select(col("doc_id"), explode(bigrams(col("toks"))).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("n"))

    val c12 = docBigrams.groupBy(col("bigram")).agg(sum(col("n")).as("c12"))
    val c1 = docBigrams
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .groupBy(col("w1")).agg(sum(col("n")).as("c1"))
    val vocab = docs.select(explode(col("toks")).as("term"))
      .agg(count_distinct(col("term")).as("v"))

    val scored = docBigrams
      .join(c12, "bigram")
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .join(c1, "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("ppm", expr(s"((c12 + 1L) * ${Scale}L) div (c1 + v)"))

    val perDoc = scored.groupBy(col("doc_id"))
      .agg(sum(col("n") * col("ppm")).as("ppm_sum"), sum(col("n")).as("n_bigrams"))

    // Corpus mean = one IEEE division of two exact longs (broadcast, no collect).
    val corpusAvg = perDoc
      .agg((sum(col("ppm_sum")).cast("double") / sum(col("n_bigrams"))).as("corpus_avg"))

    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("ppm_sum", coalesce(col("ppm_sum"), lit(0L)))
      .withColumn("avg_ppm",
        when(col("n_bigrams") > 0, col("ppm_sum").cast("double") / col("n_bigrams")))
      .crossJoin(broadcast(corpusAvg))
      .withColumn("below_corpus_avg",
        coalesce(col("avg_ppm") < col("corpus_avg"), lit(false)))
      .select(col("doc_id"), col("n_bigrams"), col("ppm_sum"), col("avg_ppm"),
        col("below_corpus_avg"))
  }
}
