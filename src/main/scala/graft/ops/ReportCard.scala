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

  /** CORPUS RELEASE-READINESS CARD (r17) — the ONE ROW a release review
    * reads before shipping a training corpus, composing the engine's
    * already-gated audits: volume (doc/token mass), near-dup exposure and
    * what dedup buys (q313), contamination exposure and what passage
    * surgery rescues (q334), how much of the benchmark the corpus has
    * absorbed (q348) and how many eval items are outright burned (q349),
    * plus the fully-curated pool's token mass and the mix solver's
    * infeasible-cell count (q347) — i.e. "how big, how dirty, how fixable,
    * is the benchmark still valid, and can the target mix actually be
    * served". Every arm is an existing oracle-gated operator, so the card
    * can never drift from the audits it summarizes (the q100/q109
    * composition discipline); the card itself is hash-gated end to end.
    *
    * Scale shape: six one-row/rollup arms, all riding session memos
    * (doc_tokens, clusters, decontam_flags, passage_flags, domain cells) —
    * the card costs six broadcast cross joins on top of artifacts the
    * suite has already paid for.
    */
  def releaseReadiness(spark: SparkSession, sfDir: String): DataFrame = {
    val corpus = Corpus.docTokens(spark, sfDir)
      .agg(count(lit(1)).as("n_docs"), sum(col("n_alpha_toks")).as("raw_tokens"))
    val ded = Curation.dedupSavings(spark, sfDir)
      .select(col("n_reps"), col("token_savings").as("dedup_token_savings"))
    val sav = Curation.decontamSavings(spark, sfDir)
      .select(col("n_docs").as("n_train_docs"), col("n_docs_flagged"),
        (col("n_docs_flagged").cast("double") / col("n_docs").cast("double"))
          .as("contamination_rate"),
        col("tokens_rescued_share"))
    val sat = Curation.evalSaturation(spark, sfDir)
      .select(col("leaked_gram_share"))
    val burn = Curation.burnedEvalItems(spark, sfDir)
      .agg(sum(when(col("is_burned"), 1L).otherwise(0L)).as("n_burned_items"))
    val pool = TrainingMix.poolMix(spark, sfDir)
      .agg(sum(col("avail_tokens")).as("pool_tokens"),
        sum(when(!col("feasible"), 1L).otherwise(0L)).as("mix_infeasible_cells"))
    // the semantic channel (q354, r17): how many eval items have a
    // τ-matched training neighbor, and how many of those the gram filter
    // MISSED — the leak n-gram decontamination structurally cannot see
    val sem = Similarity.semanticDecontam(spark, sfDir)
      .agg(sum(when(col("is_semantic_match"), 1L).otherwise(0L))
          .as("n_semantic_matches"),
        sum(when(col("paraphrase_leak"), 1L).otherwise(0L))
          .as("n_paraphrase_leaks"))
    // the severity channel (q360, r17): how many training docs ARE a
    // benchmark item (wholesale), and what the graduated remedy retains
    val sev = Curation.graduatedPolicy(spark, sfDir)
      .select(col("n_wholesale").as("n_wholesale_docs"),
        col("retained_graduated").as("graduated_retained_tokens"))
    corpus.crossJoin(broadcast(ded)).crossJoin(broadcast(sav))
      .crossJoin(broadcast(sat)).crossJoin(broadcast(burn))
      .crossJoin(broadcast(pool)).crossJoin(broadcast(sem))
      .crossJoin(broadcast(sev))
  }

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
