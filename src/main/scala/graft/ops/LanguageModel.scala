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
  private[ops] def bigramsOf(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
  private def bigrams(toks: Column): Column = bigramsOf(toks)

  /** Per-document bigram-LM scores with a corpus-relative filter flag.
    *
    * Output: (doc_id, n_bigrams, ppm_sum, avg_ppm, below_corpus_avg) —
    * `avg_ppm` is the doc's mean smoothed bigram probability in ppm;
    * `below_corpus_avg` marks docs scoring under the corpus-wide mean (the
    * would-be-filtered slice). Docs with < 2 tokens surface with
    * n_bigrams = 0 and null score, never silently dropped.
    */
  def bigramLmScores(spark: SparkSession, sfDir: String): DataFrame = {
    val perDoc = perDocTotals(spark, sfDir)

    // Corpus mean = one IEEE division of two exact longs (broadcast, no collect).
    val corpusAvg = perDoc
      .agg((sum(col("ppm_sum")).cast("double") / sum(col("n_bigrams"))).as("corpus_avg"))

    allDocScores(spark, sfDir, perDoc)
      .crossJoin(broadcast(corpusAvg))
      .withColumn("below_corpus_avg",
        coalesce(col("avg_ppm") < col("corpus_avg"), lit(false)))
      .select(col("doc_id"), col("n_bigrams"), col("ppm_sum"), col("avg_ppm"),
        col("below_corpus_avg"))
  }

  /** Exact per-document LM totals (doc_id, ppm_sum, n_bigrams) — one row per
    * document WITH at least one bigram. Shared by [[bigramLmScores]] and the
    * q314 perplexity filter so both consumers score under the identical model
    * trees (the q268 shared-definition convention, applied to a batch pair).
    *
    * MEMOIZED once per (session, scale factor) through the same registry as
    * the dedup/graph frames: training the bigram model (the explode +
    * vocab-squared aggregates above this frame) was still paid privately by
    * each consumer — q110 and q314 both re-ran it (~4 s apiece at sf0.1)
    * even though they score under one model definition. Three longs per
    * document, so holding it costs what the cluster-label frame does; the
    * bench's cache_paid/cache_hit lists attribute which query materialized
    * it. At 100 TB this is the "score the corpus once, gate it many ways"
    * shape: the scored table is written once and every filter reads it.
    */
  private val perDocCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private[ops] def perDocTotals(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.cached(perDocCache, "lm_perdoc", spark, sfDir)(
      perDocTotalsCompute(spark, sfDir))

  private[ops] def perDocTotalsCompute(spark: SparkSession, sfDir: String): DataFrame = {
    // scan-parallelism floor (r19, Tables.spreadScan scaladoc): the tokenize +
    // bigram explode + map-side partial agg pipeline into the 1-partition
    // test scan; no-op at cluster-scale layouts
    val docs = Tables.spreadScan(Tables.documents(spark, sfDir), col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))

    // One explode, immediately reduced: (doc_id, bigram, n) — the only
    // per-occurrence-width stage, and it combines map-side. Both model
    // tables below derive from this aggregate (c1 from c12, not from the
    // per-doc table), so the replayed work per consumer is the vocab-bounded
    // aggregate, and AQE's stage reuse dedupes the identical scan+explode
    // exchanges at runtime.
    val docBigrams = docs
      .select(col("doc_id"), explode(bigrams(col("toks"))).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("n"))

    val c12 = docBigrams.groupBy(col("bigram")).agg(sum(col("n")).as("c12"))
    // context counts roll up from the bigram model (|vocab|² rows), not the
    // per-doc table — the cheaper equivalent aggregation
    val c1 = c12
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = docs.select(explode(col("toks")).as("term"))
      .agg(count_distinct(col("term")).as("v"))

    val scored = docBigrams
      .join(c12, "bigram")
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .join(c1, "w1")
      .crossJoin(broadcast(vocab))
      .withColumn("ppm", expr(s"((c12 + 1L) * ${Scale}L) div (c1 + v)"))

    scored.groupBy(col("doc_id"))
      .agg(sum(col("n") * col("ppm")).as("ppm_sum"), sum(col("n")).as("n_bigrams"))
  }

  /** [[perDocTotals]] left-joined back onto the full corpus: every document
    * surfaces, unscoreable ones (< 2 tokens) with zero counts and null score.
    */
  private def allDocScores(spark: SparkSession, sfDir: String,
      perDoc: DataFrame): DataFrame =
    Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .withColumn("ppm_sum", coalesce(col("ppm_sum"), lit(0L)))
      .withColumn("avg_ppm",
        when(col("n_bigrams") > 0, col("ppm_sum").cast("double") / col("n_bigrams")))

  /** PER-DOCUMENT LM QUALITY FILTER (the CCNet/Gopher perplexity gate): every
    * scoreable document ranks by its [[bigramLmScores]] likelihood and the
    * bottom `dropPermille`‰ is marked dropped — the classic "train a cheap LM
    * on the corpus, filter the tail that looks least like language" stage,
    * which the corpus-MEAN flag of q110 cannot express (a percentile keeps
    * the kept-set SIZE stable as the score distribution drifts; a mean
    * threshold does not).
    *
    * Exactness: avg_ppm is one IEEE division of two exact longs per doc
    * (bit-reproducible); the global ordering (avg_ppm, doc_id) is computed by
    * [[Relational.twoPhaseRank]] — value-range buckets + bucket-local sorts,
    * NEVER a single-task global window — and the keep line is the exact
    * integer comparison rk > (n_scored·dropPermille) div 1000. Documents with
    * no bigram (< 2 tokens) cannot be scored: they surface with rank null and
    * kept = false (a quality filter drops what it cannot score), never
    * silently vanish.
    *
    * Scale shape: the model chain is q110's (map-side-combined per-doc gram
    * aggregate, vocab-bounded model tables); the rank adds one broadcast
    * (min, max) probe and one |buckets|-row offset frame. Output: (doc_id,
    * n_bigrams, avg_ppm, rk, kept).
    */
  def perplexityFilter(spark: SparkSession, sfDir: String,
      dropPermille: Int = 200): DataFrame = {
    val perDoc = perDocTotals(spark, sfDir)
    val scored = perDoc
      .withColumn("avg_ppm", col("ppm_sum").cast("double") / col("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"), col("avg_ppm"))
    val n = scored.agg(count(lit(1)).as("n_scored"))
    val ranked = Relational.twoPhaseRank(scored, "avg_ppm", "doc_id", "rk")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("n_bigrams"), col("avg_ppm"), col("rk"),
        (col("rk") > expr(s"(n_scored * ${dropPermille}L) div 1000L")).as("kept"))
    val unscored = Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(perDoc.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit(0L).as("n_bigrams"),
        lit(null).cast("double").as("avg_ppm"), lit(null).cast("long").as("rk"),
        lit(false).as("kept"))
    ranked.unionByName(unscored)
  }

  /** DSIR-shaped importance weights (Xie et al. 2023, "Data Selection via
    * Importance Resampling" — public arXiv 2302.03169): score every document
    * by how much its hashed-n-gram feature profile looks like a TARGET slice
    * versus the RAW rest, the data-mixing stage that upsamples
    * high-value-domain lookalikes out of a web crawl.
    *
    * Features are bigrams hashed into `buckets` buckets (the DSIR trick that
    * makes the model size corpus-independent: 2·`buckets` longs, broadcast).
    * Per-bucket add-one-smoothed probabilities for each slice are computed in
    * the same exact ppm fixed point as [[bigramLmScores]]; a document's
    * weight is the occurrence-weighted sum of per-feature evidence
    * (tp − rp). DSIR proper sums log-ratios — same sign per feature,
    * same resampling direction, but `ln()` is not exactly gateable, so the
    * oracle-gated form uses the probability-difference evidence and the
    * Scaladoc records the swap (swap in log-ratio doubles for production
    * ranking fidelity if desired; the plan shape is identical).
    *
    * Scale: the only per-occurrence stage is the explode, reduced immediately
    * to (doc_id, is_target, bucket, n) map-side. Both model tables are ≤
    * `buckets` rows (broadcast by AQE); totals ride one broadcast row.
    */
  def importanceWeights(spark: SparkSession, sfDir: String,
      targetSource: String = "src0", buckets: Int = 4096): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), tokens(col("text")).as("toks"))

    val feats = docs
      .select(col("doc_id"), (col("source") === targetSource).as("is_target"),
        explode(bigrams(col("toks"))).as("bigram"))
      .withColumn("bucket",
        conv(substring(md5(col("bigram")), 1, 8), 16, 10).cast("long") % buckets)
      .groupBy(col("doc_id"), col("is_target"), col("bucket"))
      .agg(count(lit(1)).as("n"))

    val tb = feats.filter(col("is_target")).groupBy(col("bucket"))
      .agg(sum(col("n")).as("t_b"))
    val rb = feats.filter(!col("is_target")).groupBy(col("bucket"))
      .agg(sum(col("n")).as("r_b"))
    val totals = feats.agg(
      sum(when(col("is_target"), col("n")).otherwise(0L)).as("t_total"),
      sum(when(!col("is_target"), col("n")).otherwise(0L)).as("r_total"))

    val perDoc = feats
      .join(tb, Seq("bucket"), "left")
      .join(rb, Seq("bucket"), "left")
      .na.fill(0L, Seq("t_b", "r_b"))
      .crossJoin(broadcast(totals))
      .withColumn("tp", expr(s"((t_b + 1L) * ${Scale}L) div (t_total + ${buckets}L)"))
      .withColumn("rp", expr(s"((r_b + 1L) * ${Scale}L) div (r_total + ${buckets}L)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_features"),
        sum(col("n") * (col("tp") - col("rp"))).as("weight_ppm"))

    docs.select(col("doc_id"), col("source"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("n_features", coalesce(col("n_features"), lit(0L)))
      .withColumn("weight_ppm", coalesce(col("weight_ppm"), lit(0L)))
      .withColumn("target_like", col("weight_ppm") > 0)
      .select(col("doc_id"), col("source"), col("n_features"), col("weight_ppm"),
        col("target_like"))
  }
}
