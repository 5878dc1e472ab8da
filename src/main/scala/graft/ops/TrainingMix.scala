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

  /** TEMPERATURE-SCALED source sampling weights — the multilingual/
    * multi-source mixing rule of mT5/XLM-R (public: arXiv 1910.10683 §3.4,
    * arXiv 1911.02116 §3): p(s) ∝ n_tokens(s)^α with α < 1 flattening the
    * size distribution so small sources are upsampled relative to their
    * share. Output per source: exact counts, the normalized weight, and the
    * token allocation ⌊weight · budget⌋ a sampling job consumes.
    *
    * Cross-engine determinism (the pow trap): `pow` is NOT correctly
    * rounded and differs between the JVM and libm, so n^α is computed as
    * exp(α·ln n) with BOTH transcendental outputs rounded to 12 decimals
    * through the decimal bridge (ln first, then the exp of the exact
    * product) — the same discipline as BM25's idf. The normalizing total is
    * an exact decimal fold riding a broadcast one-row frame; the final
    * weight and allocation are IEEE divisions/multiplications (correctly
    * rounded everywhere) and a floor. One corpus-sized aggregate, then
    * |sources|-row arithmetic.
    */
  def temperatureMix(spark: SparkSession, sfDir: String,
      alpha: Double = 0.3, tokenBudget: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val perSource = Tables.documents(spark, sfDir)
      .select(col("source"), TextAnalysis.qualityTokens.cast("long").as("nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    val lnT = graft.core.Num.decToDouble(
      log(col("n_tokens").cast("double")).cast(DecimalType(18, 12)))
    val pRaw = graft.core.Num.decToDouble(
      exp(lit(alpha) * lnT).cast(DecimalType(18, 12)))
    val scored = perSource.withColumn("p_raw", pRaw)
    val tot = scored.agg(graft.core.Num.decToDouble(
      sum(col("p_raw").cast(DecimalType(28, 14)))).as("t"))
    scored.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("p_raw") / col("t")).as("weight"),
        floor((col("p_raw") / col("t")) * tokenBudget).cast("long")
          .as("tokens_alloc"))
  }

  /** DOMAIN-MIX REWEIGHTING (DoReMi-lite, after arXiv 2305.10429's framing
    * of per-domain sampling weights — the weights here come from a declared
    * TARGET distribution rather than a trained proxy model): turns a target
    * token distribution over (source, lang) cells into per-domain sampling
    * weights with a feasibility readout. The target is the INDEPENDENCE
    * product of the observed marginals — target(s, l) ∝ share(s)·share(l),
    * renormalized over the observed cells — i.e. "keep each source's and
    * each language's overall share, but break the source↔language coupling"
    * (a real mix correction: a corpus where one source supplies all of one
    * language gets its coupled cells down-weighted). The budget is half the
    * corpus's exact token total (T div 2), so the readout is self-contained.
    *
    * Output per observed cell: exact n_docs / avail_tokens, avail_share
    * (one IEEE division of exact longs), target_share, weight =
    * target_share / avail_share (>1 means upsample), required_tokens =
    * ⌊target_share·budget⌋, feasible = required ≤ available (an infeasible
    * cell caps the mix: the q313-style readout a sampling job checks BEFORE
    * burning compute), and the budget riding every row (the q243
    * repeated-total convention).
    *
    * Cross-engine determinism: marginal shares and the independence product
    * are IEEE arithmetic on exact longs (correctly rounded everywhere); the
    * only order-dependent step — normalizing Σ target over cells — folds as
    * an exact DECIMAL(28,14) sum of the 14-decimal-quantized products (the
    * q193 discipline), then one IEEE division per cell. Scale shape: ONE
    * corpus-sized tokenize+aggregate to the |sources|·|langs| cell frame;
    * marginals and the normalizer are broadcast one-row/1-col frames;
    * everything after is per-cell arithmetic.
    */
  def domainMix(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cells = Tables.documents(spark, sfDir)
      .select(col("source"), col("lang"),
        TextAnalysis.qualityTokens.cast("long").as("nt"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("avail_tokens"))
      .localCheckpoint(true)
    val srcTok = cells.groupBy(col("source"))
      .agg(sum(col("avail_tokens")).as("tok_s"))
    val langTok = cells.groupBy(col("lang"))
      .agg(sum(col("avail_tokens")).as("tok_l"))
    val tot = cells.agg(sum(col("avail_tokens")).as("tok_t"),
      expr("sum(avail_tokens) div 2").as("budget_tokens"))
    val withShares = cells
      .join(broadcast(srcTok), "source")
      .join(broadcast(langTok), "lang")
      .crossJoin(broadcast(tot))
      .withColumn("avail_share",
        col("avail_tokens").cast("double") / col("tok_t").cast("double"))
      .withColumn("p_raw",
        graft.core.Num.decToDouble(
          ((col("tok_s").cast("double") / col("tok_t").cast("double")) *
            (col("tok_l").cast("double") / col("tok_t").cast("double")))
            .cast(DecimalType(18, 14))))
    val norm = withShares.agg(graft.core.Num.decToDouble(
      sum(col("p_raw").cast(DecimalType(28, 14)))).as("z"))
    withShares.crossJoin(broadcast(norm))
      .withColumn("target_share", col("p_raw") / col("z"))
      .withColumn("required_tokens",
        floor(col("target_share") * col("budget_tokens")).cast("long"))
      .select(col("source"), col("lang"), col("n_docs"), col("avail_tokens"),
        col("avail_share"), col("target_share"),
        (col("target_share") / col("avail_share")).as("weight"),
        col("required_tokens"),
        (col("required_tokens") <= col("avail_tokens")).as("feasible"),
        col("budget_tokens"))
  }
}
