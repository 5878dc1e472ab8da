package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{Num, Tables}

/** Model-evaluation operators: the audits a training pipeline runs over a
  * scored corpus before trusting a filter model (here: the fixed-weight
  * quality classifier of [[Curation.qualityClassifier]] evaluated against
  * the English-language label — the stopword feature is an English list, so
  * the score *should* separate `lang = 'en'`, and these operators measure
  * exactly how well). The reference ships no model evaluation at all
  * (`/root/reference/src/transform/transform.py` stops at aggregates); this
  * tier is the beyond-reference LLM-pipeline surface.
  */
object Evaluation {

  /** Quality score joined with the binary English label. The score is a
    * pure per-row map over documents; the label join is a PK equi-join on
    * doc_id (co-partitioned at scale, never skewed — doc_id is unique).
    */
  private def scoredWithLabel(spark: SparkSession, sfDir: String): DataFrame = {
    val scores = Curation.qualityClassifier(spark, sfDir)
      .select(col("doc_id"), col("score"))
    val labels = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    scores.join(labels, "doc_id")
  }

  /** ROC-AUC of the quality score against the English label, computed by
    * the Mann–Whitney identity AUC = U₁/(n₁·n₂) — never materializing the
    * O(n₁·n₂) pair space and never ranking rows globally. From per-score
    * counts (c1 = positives, c2 = negatives at that score value),
    * 2·U₁ = Σ_v c1(v)·(2·cum2(v) − c2(v)) with cum2 the negatives
    * at-or-below v — strictly-below pairs count 1, tied pairs ½, doubled to
    * stay in exact BIGINT until the single final division. The cumulative
    * counts come from [[Statistics.cumulativeGroupCounts]] — the q203/q204
    * two-phase engine (value-range buckets + broadcast prefix offsets), so
    * no single-task window touches the near-unique score stream. Scale
    * shape: one scan-speed scoring pass, one PK join, one per-value
    * aggregate, the two-phase cumulative, one final fold — the 100 TB AUC.
    */
  def rocAuc(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = scoredWithLabel(spark, sfDir)
      .groupBy(col("score").as("x"))
      .agg(sum(col("y")).as("c1"), sum(lit(1L) - col("y")).as("c2"))
    val cum = Statistics.cumulativeGroupCounts(counts)
    val s = cum.agg(
      max(col("cum1")).as("n_pos"), max(col("cum2")).as("n_neg"),
      sum(col("c1") * (lit(2L) * col("cum2") - col("c2"))).as("auc_num2"))
    val auc = col("auc_num2").cast("double") /
      (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double"))
    s.select(col("n_pos"), col("n_neg"), col("auc_num2"),
      auc.as("auc"), (lit(2.0) * auc - lit(1.0)).as("gini_rank"))
  }

  /** PER-SEGMENT ROC-AUC — q235's Mann–Whitney machinery run within each
    * document-length band (short <200 / medium <400 / long chars): the
    * model-audit slice that catches a filter whose discrimination collapses
    * on exactly the long documents a training mix needs most. Same exact
    * BIGINT 2·U numerator per segment, cumulative counts per segment
    * through [[Statistics.cumulativeGroupCountsBy]] (the grouped two-phase
    * engine — no single-task window even when one segment dominates), one
    * final division per segment; a single-class segment (no positives or no
    * negatives) reports NULL auc rather than a division blow-up, in both
    * engines via the same guard.
    */
  /** The document length band shared by q239 and q243 — cut points chosen to
    * tercile the synthetic corpus; ONE definition so the eval slices and the
    * independence test always talk about the same segments.
    */
  private[ops] def lengthBand: Column =
    when(col("n_chars") < 200, "short")
      .when(col("n_chars") < 400, "medium").otherwise("long")

  def rocAucBySegment(spark: SparkSession, sfDir: String): DataFrame = {
    val seg = lengthBand
    val scores = Curation.qualityClassifier(spark, sfDir)
      .select(col("doc_id"), col("score"))
    val labels = Tables.documents(spark, sfDir)
      .select(col("doc_id"), seg.as("segment"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val counts = scores.join(labels, "doc_id")
      .groupBy(col("segment"), col("score").as("x"))
      .agg(sum(col("y")).as("c1"), sum(lit(1L) - col("y")).as("c2"))
    val cum = Statistics.cumulativeGroupCountsBy(counts, Seq("segment"))
    val s = cum.groupBy(col("segment")).agg(
      max(col("cum1")).as("n_pos"), max(col("cum2")).as("n_neg"),
      sum(col("c1") * (lit(2L) * col("cum2") - col("c2"))).as("auc_num2"))
    val bothClasses = col("n_pos") > 0 && col("n_neg") > 0
    val auc = col("auc_num2").cast("double") /
      (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double"))
    s.select(col("segment"), col("n_pos"), col("n_neg"), col("auc_num2"),
      when(bothClasses, auc).as("auc"),
      when(bothClasses, lit(2.0) * auc - lit(1.0)).as("gini_rank"))
  }

  /** THRESHOLD SWEEP — precision / recall / F1 of the quality filter at the
    * nine deciles 0.1..0.9: the operating-point table a pipeline reads
    * before fixing a keep-threshold (q235's AUC summarizes ranking; this is
    * the decision view). Every metric is ONE division of exact BIGINTs
    * (F1 spelled 2·TP/(2·TP+FP+FN) — never the compound 2PR/(P+R) tree), so
    * the doubles are cross-engine identical; an empty predicted-positive
    * set yields NULL precision in both engines via the same guard.
    * Scale shape: one scan-speed scoring pass collapses to per-score counts
    * (|distinct scores| rows), the 9-row threshold frame broadcasts onto
    * THAT — the raw corpus is never amplified.
    */
  def thresholdMetrics(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = scoredWithLabel(spark, sfDir)
      .groupBy(col("score").as("x"))
      .agg(sum(col("y")).as("c1"), sum(lit(1L) - col("y")).as("c2"))
    sweepFromCounts(spark, counts)
  }

  /** The q242 sweep tail over an already-aggregated per-score counts frame
    * (x, c1, c2) — factored so the STREAMING sweep (q255) applies the
    * identical arithmetic to its drained state and shares q242's oracle
    * verbatim (the q241/q246 parity pattern).
    */
  private[graft] def sweepFromCounts(spark: SparkSession, counts: DataFrame): DataFrame = {
    val ts = spark.range(1, 10)
      .select((col("id").cast("double") / 10.0).as("t"))
    val cm = counts.crossJoin(broadcast(ts))
      .groupBy(col("t"))
      .agg(
        sum(when(col("x") >= col("t"), col("c1")).otherwise(0L)).as("tp"),
        sum(when(col("x") >= col("t"), col("c2")).otherwise(0L)).as("fp"),
        sum(when(col("x") < col("t"), col("c1")).otherwise(0L)).as("fn"),
        sum(when(col("x") < col("t"), col("c2")).otherwise(0L)).as("tn"))
    // "precision" is a type keyword in SQL dialects — prec/rec keep the
    // oracle twin quoting-free
    cm.select(col("t"), col("tp"), col("fp"), col("fn"), col("tn"),
      when(col("tp") + col("fp") > 0,
        col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
        .as("prec"),
      when(col("tp") + col("fn") > 0,
        col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
        .as("rec"),
      when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
        (lit(2L) * col("tp")).cast("double") /
          (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"))
        .as("f1"))
  }

  /** CALIBRATION (reliability) TABLE + per-bin Brier decomposition: scores
    * land in ten fixed-width bins on [0,1]; each bin reports its count,
    * exact mean predicted probability, observed positive rate, and mean
    * squared error (the Brier contribution). A well-calibrated filter has
    * avg_score ≈ pos_rate per bin — the audit that catches a quality model
    * whose threshold silently drifts as the corpus mix shifts.
    *
    * Determinism: the bin is floor(score·10) clamped to 9 (score = 1.0
    * occurs when the 9-decimal quantized exp underflows to 0); the mean
    * folds 12-decimal-quantized scores exactly; the squared error quantizes
    * each per-row double square to 12 decimals before the exact decimal
    * fold (the q233 recipe), so every aggregate is order-independent and
    * the only doubles are fixed correctly-rounded trees. Scale shape: one
    * scan-speed scoring pass, one PK join, one 10-group aggregate — no
    * window, no shuffle beyond the final tiny groupBy.
    */
  def calibrationBins(spark: SparkSession, sfDir: String): DataFrame = {
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(28, 12))
    val err = col("score") - col("y").cast("double")
    scoredWithLabel(spark, sfDir)
      .withColumn("bin", least(floor(col("score") * 10).cast("long"), lit(9L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        Num.decToDouble(sum(q12(col("score")))).as("sum_score"),
        Num.decToDouble(sum(q12(err * err))).as("sum_sq_err"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("sum_score") / col("n").cast("double")).as("avg_score"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("pos_rate"),
        (col("sum_sq_err") / col("n").cast("double")).as("brier"))
  }

  /** GROUPED CALIBRATION DRIFT — q236's reliability table computed WITHIN
    * each ingest `source`, rolled up to one Expected Calibration Error per
    * source: ECE = Σ_bins (n_bin/n_source)·|avg_score − pos_rate|, plus the
    * worst single-bin gap. Documents carry no timestamp, so `source` is the
    * corpus's batch axis (crawl snapshots arrive per source) — the audit
    * that catches a quality filter whose calibration holds globally but has
    * silently drifted on one upstream feed, which per-bin global q236 (and
    * the global threshold sweep q242) average away.
    *
    * Determinism: per-bin avg_score/pos_rate/gap are fixed trees over
    * exact-decimal-folded sums; the ≤10-term per-source ECE sum quantizes
    * each weighted gap to 12 decimals and folds exactly (the q233 recipe —
    * a raw double Σ would depend on combine order); max over doubles is
    * order-free. Scale shape: one scan-speed scoring pass, one 10×|sources|
    * aggregate, then everything runs on the tiny bins frame (broadcast
    * totals join, one aggregate per source).
    */
  def calibrationBySource(spark: SparkSession, sfDir: String): DataFrame = {
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(28, 12))
    val scored = Curation.qualityClassifier(spark, sfDir)
      .select(col("doc_id"), col("score"))
      .join(Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y")), "doc_id")
    val bins = scored
      .withColumn("bin", least(floor(col("score") * 10).cast("long"), lit(9L)))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        Num.decToDouble(sum(q12(col("score")))).as("sum_score"))
    val gap = abs(col("sum_score") / col("n").cast("double") -
      col("n_pos").cast("double") / col("n").cast("double"))
    val totals = bins.groupBy(col("source")).agg(sum(col("n")).as("n_src"))
    bins.join(broadcast(totals), "source")
      .select(col("source"), col("n"), col("n_src"), gap.as("gap"))
      .groupBy(col("source"))
      .agg(max(col("n_src")).as("n_docs"),
        Num.decToDouble(sum(q12(
          col("n").cast("double") / col("n_src").cast("double") * col("gap"))))
          .as("ece"),
        max(col("gap")).as("max_gap"))
  }

  /** McNEMAR'S TEST (McNemar 1947, public) between the two English
    * detectors the engine already ships — the q23 language-ID heuristic
    * (A: guessed_lang = 'en') and the q195 quality classifier thresholded
    * at 0.5 (B: score ≥ 0.5) — against the labeled truth: the PAIRED
    * comparison that decides "is classifier B actually better than A on
    * the same documents?", which two separate accuracies cannot (they
    * ignore that both see the same rows). Only the DISCORDANT counts
    * matter: b = A right ∧ B wrong, c = A wrong ∧ B right; the
    * continuity-corrected χ² = (|b−c|−1)²/(b+c) is one fixed tree over
    * exact BIGINTs (NULL-guarded when b+c = 0 — ANSI throws on the zero
    * divide), df = 1, reject at 3.841. One scan joining two scan-speed
    * per-row maps on the PK; the fold is a single aggregate.
    */
  def mcnemar(spark: SparkSession, sfDir: String): DataFrame = {
    val a = TextAnalysis.langId(spark, sfDir)
      .select(col("doc_id"),
        (col("guessed_lang") === "en").cast("long").as("pred_a"))
    val b = Curation.qualityClassifier(spark, sfDir)
      .select(col("doc_id"), (col("score") >= 0.5).cast("long").as("pred_b"))
    val y = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val counts = a.join(b, "doc_id").join(y, "doc_id")
      .select((col("pred_a") === col("y")).as("ca"),
        (col("pred_b") === col("y")).as("cb"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("ca") && col("cb"), 1L).otherwise(0L)).as("n_both_correct"),
        sum(when(col("ca") && !col("cb"), 1L).otherwise(0L)).as("n_only_a"),
        sum(when(!col("ca") && col("cb"), 1L).otherwise(0L)).as("n_only_b"),
        sum(when(!col("ca") && !col("cb"), 1L).otherwise(0L)).as("n_both_wrong"))
    val bc = col("n_only_a") + col("n_only_b")
    val diff = abs(col("n_only_a") - col("n_only_b")) - 1L
    val chi2 = when(bc > 0,
      (diff * diff).cast("double") / bc.cast("double"))
    counts.select(col("n_docs"), col("n_both_correct"), col("n_only_a"),
      col("n_only_b"), col("n_both_wrong"), chi2.as("mcnemar_chi2"),
      when(bc > 0, chi2 > 3.841).otherwise(lit(false)).as("reject_05"))
  }

  /** DECILE LIFT / GAIN TABLE of the quality score against the English
    * label — "how concentrated are the positives in the top-scored
    * slices?", the campaign-targeting readout beside q235's AUC and q236's
    * calibration. NO global row rank: per-score counts collapse first
    * (q242's insight), the [[Statistics.cumulativeGroupCounts]] two-phase
    * engine cumulates them over the NEGATED score (so at-or-below means
    * at-or-above the raw score), and each distinct-score block lands in
    * the decile of its FIRST row ((start−1)·10 DIV n — floor-distribution
    * on the block's starting rank, a pure function of exact counts, so a
    * tie block never splits nondeterministically). Per-decile and
    * cumulative counts stay exact BIGINTs; cumulative lift =
    * (cum_pos·n_total)/(cum_n·pos_total) is ONE division of exact products
    * — never precision/base as two rounded ratios. Scale shape: scan →
    * per-value aggregate → two-phase cumulative → 10-row frame.
    */
  def decileLift(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = scoredWithLabel(spark, sfDir)
      .select((-col("score")).as("x"), col("y"))
      .groupBy(col("x"))
      .agg(sum(col("y")).as("c1"), sum(lit(1L) - col("y")).as("c2"))
    val cum = Statistics.cumulativeGroupCounts(counts)
    val tot = cum.agg(max(col("cum1")).as("pos_total"),
      max(col("cum1") + col("cum2")).as("n_total"))
    val byDecile = cum.crossJoin(broadcast(tot))
      .withColumn("start", col("cum1") + col("cum2") - col("c1") - col("c2"))
      .withColumn("decile", expr("start * 10 DIV n_total"))
      .groupBy(col("decile"))
      .agg(sum(col("c1") + col("c2")).as("n_rows"), sum(col("c1")).as("n_pos"),
        max(col("pos_total")).as("pos_total"), max(col("n_total")).as("n_total"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, 0)
    byDecile
      .withColumn("cum_n", sum(col("n_rows")).over(w))
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
      .select(col("decile"), col("n_rows"), col("n_pos"), col("cum_n"),
        col("cum_pos"),
        ((col("cum_pos") * col("n_total")).cast("double") /
          (col("cum_n") * col("pos_total")).cast("double")).as("cum_lift"))
  }

  /** CLASSIFIER KS (the Kolmogorov–Smirnov separation statistic, the
    * credit-scoring industry's standard model metric): max over thresholds
    * of |TPR − FPR|, computed as q203's exact-integer maximization over
    * the per-score cumulative counts — max |cum1·n₂ − cum2·n₁| stays
    * BIGINT, ONE division at the end, and the achieving threshold is the
    * smallest score among ties (deterministic). Same machinery as
    * [[rocAuc]]; KS and AUC read the same cumulative frame two ways.
    */
  def classifierKs(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = scoredWithLabel(spark, sfDir)
      .select(col("score").as("x"), col("y"))
      .groupBy(col("x"))
      .agg(sum(col("y")).as("c1"), sum(lit(1L) - col("y")).as("c2"))
    val cum = Statistics.cumulativeGroupCounts(counts)
    val tot = cum.agg(max(col("cum1")).as("n1"), max(col("cum2")).as("n2"))
    val d = cum.crossJoin(broadcast(tot))
      .select(col("x"), col("n1"), col("n2"),
        abs(col("cum1") * col("n2") - col("cum2") * col("n1")).as("dn"))
    val mx = d.groupBy(col("n1"), col("n2")).agg(max(col("dn")).as("d_num"))
    val arg = d.join(broadcast(mx), Seq("n1", "n2"))
      .filter(col("dn") === col("d_num"))
      .groupBy(col("n1"), col("n2"), col("d_num"))
      .agg(min(col("x")).as("threshold"))
    arg.select(col("n1").as("n_pos"), col("n2").as("n_neg"), col("d_num"),
      (col("d_num").cast("double") /
        (col("n1").cast("double") * col("n2").cast("double"))).as("ks_stat"),
      col("threshold"))
  }

  /** COHEN'S KAPPA (Cohen 1960, public) between the q23 language-ID
    * heuristic and the labeled language — chance-corrected agreement, the
    * inter-rater statistic read beside q220's raw confusion matrix (raw
    * accuracy flatters a classifier on a skewed label mix; kappa does
    * not). ENTIRELY exact until one division:
    *   κ = (N·Σᵢnᵢᵢ − Σ_c r_c·g_c) / (N² − Σ_c r_c·g_c)
    * — diagonal, row and column margins fold as BIGINTs off the
    * |classes|² cell frame, so po and pe never divide separately inside
    * the statistic. NULL labels stay visible as an explicit '(null)'
    * class (the house rule — q199/q243 precedent). Scale shape: one
    * classifier scan + one groupBy; everything after runs on ≤ |classes|²
    * rows.
    */
  def cohensKappa(spark: SparkSession, sfDir: String): DataFrame = {
    val pred = TextAnalysis.langId(spark, sfDir)
      .select(coalesce(col("labeled_lang"), lit("(null)")).as("t"),
        col("guessed_lang").as("g"))
    val cells = pred.groupBy(col("t"), col("g")).agg(count(lit(1)).as("n"))
    val marg = cells.agg(sum(col("n")).as("nn"),
      sum(when(col("t") === col("g"), col("n")).otherwise(0L)).as("diag"))
    val rowT = cells.groupBy(col("t")).agg(sum(col("n")).as("r"))
    val colT = cells.groupBy(col("g")).agg(sum(col("n")).as("c"))
    // classes absent from one margin contribute r·0 = 0 — inner join
    val pe = rowT.join(colT, col("t") === col("g"))
      .agg(coalesce(sum(col("r") * col("c")), lit(0L)).as("pe_num"))
    marg.crossJoin(broadcast(pe)).select(
      col("nn").as("n_docs"), col("diag").as("n_agree"), col("pe_num"),
      (col("diag").cast("double") / col("nn").cast("double")).as("po"),
      (col("pe_num").cast("double") /
        (col("nn").cast("double") * col("nn").cast("double"))).as("pe"),
      ((col("nn") * col("diag") - col("pe_num")).cast("double") /
        (col("nn") * col("nn") - col("pe_num")).cast("double")).as("kappa"))
  }
}
