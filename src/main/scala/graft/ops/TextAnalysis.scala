package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Text-analysis operators over the `documents` table — the LLM-data-pipeline
  * surface (BASELINE.json north star): token statistics, quality scoring,
  * language ID, document fingerprinting.
  *
  * Everything is built from codegen'd built-ins (`regexp_extract_all`, `split`,
  * higher-order array functions) — no UDFs, so the hot path stays inside
  * whole-stage codegen and scales linearly with executors; all per-document, no
  * shuffle at all (embarrassingly parallel over 100 TB).
  *
  * Determinism: outputs are integers, strings, or IEEE arithmetic on integers —
  * bit-reproducible across engines (see graft.core.Num's rationale).
  */
object TextAnalysis {

  /** Whitespace-normalized lowercase text — the canonical form all analyses use. */
  def normText(c: Column): Column = regexp_replace(lower(c), "\\s+", " ")

  private def wsTokens(c: Column): Column = split(trim(c), "\\s+")

  private[graft] def alphaTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  /** Token statistics: whitespace tokens, regex word tokens, distinct words,
    * characters-per-token. A BPE-ish proxy count (`bpe_ish_tokens`) splits on
    * word/number/punct boundaries the way byte-pair tokenizers roughly segment.
    */
  def tokenStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      size(wsTokens(col("text"))).cast("long").as("ws_tokens"),
      size(alphaTokens(col("text"))).cast("long").as("word_tokens"),
      size(array_distinct(alphaTokens(col("text")))).cast("long").as("distinct_words"),
      size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
        .cast("long").as("bpe_ish_tokens"),
      (length(regexp_replace(col("text"), "\\s", "")).cast("double") /
        size(wsTokens(col("text")))).as("chars_per_token"))

  // quality building blocks over the raw `text`/`n_chars` columns — shared
  // with Corpus.trainingFilter so q22 and q40 can never desynchronize
  private val stops = "\\b(the|a|and|of|to|in|is|it|that|for)\\b"
  private[ops] def qualityTokens: Column = size(wsTokens(col("text")))
  private[ops] def stopwordRatio: Column =
    size(regexp_extract_all(lower(col("text")), lit(stops), lit(0))).cast("double") / qualityTokens
  private[ops] def punctPerChar: Column =
    size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0))).cast("double") / col("n_chars")
  private[ops] def meanWordLen: Column =
    length(regexp_replace(col("text"), "[^A-Za-z0-9]", "")).cast("double") / qualityTokens
  private[ops] def qualityScore: Column =
    stopwordRatio * lit(0.5) + punctPerChar * lit(0.2) + meanWordLen * lit(0.05)

  /** Quality scoring: stopword ratio, punctuation density, mean word length,
    * and a combined score. All ratios are int/int IEEE divisions.
    */
  def textQuality(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      col("n_chars"),
      qualityTokens.cast("long").as("n_tokens"),
      stopwordRatio.as("stopword_ratio"),
      punctPerChar.as("punct_per_char"),
      meanWordLen.as("mean_word_len"),
      qualityScore.as("quality_score"))

  /** PER-SOURCE LENGTH PERCENTILES — the corpus-shape table a curation run
    * reads before setting length gates: exact P10/P25/P50/P75/P90 of
    * `n_chars` per source, each the q170-convention order statistic (value
    * at rank ⌈q·n/100⌉ under (n_chars, doc_id) order — ties deterministic,
    * no interpolation, engine-independent). A source whose P90 collapsed
    * since the last crawl lost its long documents; one whose P10 dropped is
    * accumulating fragments.
    *
    * Scale shape: [[Relational.twoPhaseRankBy]] gives the per-source global
    * rank with every sort (source, bucket)-local — no single-task window
    * even for a source holding most of the corpus; the 5 target ranks per
    * source ride a broadcast |sources|×5 frame into one equi-join. All
    * integers end to end.
    */
  def lengthPercentiles(spark: SparkSession, sfDir: String,
      pcts: Seq[Int] = Seq(10, 25, 50, 75, 90)): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), col("n_chars"))
    val ranked = Relational.twoPhaseRankBy(docs, Seq("source"), "n_chars", "doc_id", "rk")
    val targets = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("pct", explode(array(pcts.map(p => lit(p.toLong)): _*)))
      // ceil(pct·n/100) in exact integers
      .withColumn("rk", expr("(pct * n_docs + 99) div 100"))
    ranked.join(broadcast(targets), Seq("source", "rk"))
      .select(col("source"), col("pct"), col("n_docs"), col("n_chars").as("value"))
  }

  /** TOKENIZER FERTILITY BY LANGUAGE — the token-budget planner's exchange
    * rates: per language, exact totals of characters, word tokens and
    * BPE-ish tokens (q21's segmentation), and the two ratios every budget
    * conversion needs — fertility (BPE-ish per word: how many subword units
    * a word costs) and chars per BPE-ish token (how much raw text a token
    * buys — zh is the outlier a per-corpus average silently mis-prices).
    * ONE scan-speed aggregate; ratios are single divisions of exact longs.
    */
  def tokenizerFertility(spark: SparkSession, sfDir: String): DataFrame = {
    val words = size(alphaTokens(col("text"))).cast("long")
    val bpe = size(regexp_extract_all(col("text"),
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")
    Tables.documents(spark, sfDir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
        sum(words).as("word_tokens"), sum(bpe).as("bpe_ish_tokens"))
      .select(col("lang"), col("n_docs"), col("n_chars"), col("word_tokens"),
        col("bpe_ish_tokens"),
        (col("bpe_ish_tokens").cast("double") / col("word_tokens").cast("double"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("bpe_ish_tokens").cast("double"))
          .as("chars_per_token"))
  }

  /** Language ID by stopword-hit counting — the classic n-gram/function-word
    * heuristic. Deterministic argmax: first language in a fixed order whose count
    * equals the maximum.
    */
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    def hits(pattern: String): Column =
      size(regexp_extract_all(lower(col("text")), lit(pattern), lit(0))).cast("long")
    val en = hits("\\b(the|and|of|to|is|in|that)\\b")
    val de = hits("\\b(der|die|und|das|ist|nicht|ein)\\b")
    val es = hits("\\b(el|la|de|que|y|los|es)\\b")
    val fr = hits("\\b(le|la|de|et|les|est|une)\\b")
    val zh = hits("(的|是|不|了|在|人|有)")
    val mx = greatest(en, de, es, fr, zh)
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      col("lang").as("labeled_lang"),
      en.as("hits_en"), de.as("hits_de"), es.as("hits_es"),
      fr.as("hits_fr"), zh.as("hits_zh"),
      when(mx === 0, lit("und"))
        .when(en === mx, "en").when(de === mx, "de").when(es === mx, "es")
        .when(fr === mx, "fr").otherwise("zh").as("guessed_lang"))
  }

  /** CONFUSION MATRIX of the [[langId]] heuristic against the labeled
    * language — the model-evaluation primitive run after ANY classifier
    * lands in a pipeline: per (true, predicted) cell counts, the cell's
    * share of its true-language row, and a correctness flag. Row shares are
    * exact-long divisions (one IEEE op); overall/per-language accuracy is a
    * `filter`+`sum` away on the same frame. Scale shape: one classifier
    * scan + one groupBy; the |langs|-row totals ride in as a broadcast.
    */
  def langConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    val pred = langId(spark, sfDir).select(col("labeled_lang"), col("guessed_lang"))
    val totals = pred.groupBy(col("labeled_lang")).agg(count(lit(1)).as("n_true"))
    pred.groupBy(col("labeled_lang"), col("guessed_lang"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(totals), "labeled_lang")
      .select(col("labeled_lang"), col("guessed_lang"), col("n"), col("n_true"),
        (col("n").cast("double") / col("n_true").cast("double")).as("share_of_true"),
        (col("labeled_lang") === col("guessed_lang")).as("is_correct"))
  }

  /** Document fingerprint: md5 over the whitespace-normalized lowercase text —
    * the exact-dedup key. md5 is content-addressed and engine-portable (same hex
    * in Spark, DuckDB, and any object store's ETag tooling).
    */
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      md5(normText(col("text"))).as("fingerprint"),
      length(normText(col("text"))).cast("long").as("norm_len"))
}
