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

  /** INFORMATION GAIN of the two candidate stratification features
    * (length band, source) about the English label — the feature-selection
    * primitive (mutual information I(y; f) = H(y) − H(y|f)) read before
    * choosing what to stratify a corpus split or a quality audit by.
    * Exactness: every probability is a ratio of exact BIGINT counts;
    * every ln crosses the 12-decimal bridge (the house ln rule); each
    * cell's −(c_vy/n)·ln(c_vy/c_v) term quantizes to 12 decimals before
    * the exact fold, so accumulation order never matters. H(y) folds the
    * same way from the label margin (identical on every row — the q243
    * repeated-total convention). Scale: one counts aggregate per feature
    * over the corpus; everything after runs on |values|·2 cells.
    */
  def infoGain(spark: SparkSession, sfDir: String): DataFrame = {
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(28, 12))
    def lnB(c: Column): Column =
      Num.decToDouble(log(c).cast(DecimalType(18, 12)))
    val base = Tables.documents(spark, sfDir)
      .select(lengthBand.as("band"),
        col("source"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"))
    val cells = base.select(lit("length_band").as("feature"),
        col("band").as("v"), col("y"))
      .unionByName(base.select(lit("source").as("feature"),
        col("source").as("v"), col("y")))
      .groupBy(col("feature"), col("v"), col("y"))
      .agg(count(lit(1)).as("c_vy"))
    val vTot = cells.groupBy(col("feature"), col("v"))
      .agg(sum(col("c_vy")).as("c_v"))
    val n = base.agg(count(lit(1)).as("n"))
    // H(y) from the label margin (feature-independent)
    val yTot = base.groupBy(col("y")).agg(count(lit(1)).as("c_y"))
      .crossJoin(broadcast(n))
      .select(q12((col("c_y").cast("double") / col("n").cast("double")) *
        lnB(col("c_y").cast("double") / col("n").cast("double"))).as("t"))
      .agg((-Num.decToDouble(sum(col("t")))).as("h_y"))
    val cond = cells.join(vTot, Seq("feature", "v"))
      .crossJoin(broadcast(n))
      .select(col("feature"),
        q12((col("c_vy").cast("double") / col("n").cast("double")) *
          lnB(col("c_vy").cast("double") / col("c_v").cast("double"))).as("t"))
      .groupBy(col("feature"))
      .agg((-Num.decToDouble(sum(col("t")))).as("h_y_given"))
    cond.crossJoin(broadcast(yTot))
      .select(col("feature"), col("h_y"), col("h_y_given"),
        (col("h_y") - col("h_y_given")).as("info_gain"))
  }

  /** POINT-BISERIAL CORRELATION (public, the Pearson r of a binary and a
    * continuous variable) between the English label and document LENGTH —
    * the one-number leakage audit ("does length predict the label?") read
    * before trusting any length-correlated quality feature, and the
    * continuous-feature sibling of q282's categorical information gain.
    * ENTIRELY exact until one fixed tree: with n, n₁, S = Σx, S₁ = Σx·y,
    * Q = Σx² all exact integers, r = (n·S₁ − n₁·S)/(√(n₁·n₀)·√(n·Q − S²))
    * — products fold in DECIMAL(38,0) (the q205 integer-decimal rule, safe
    * at any corpus size), cross the VARCHAR bridge, and divide once.
    * Scale: ONE scan-speed aggregate over documents; no joins, no windows.
    */
  def pointBiserial(spark: SparkSession, sfDir: String): DataFrame = {
    def d38(c: Column): Column = c.cast(DecimalType(38, 0))
    val s = Tables.documents(spark, sfDir)
      .select(when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        col("n_chars").cast("long").as("x"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n1"),
        sum(col("x")).as("sx"), sum(col("y") * col("x")).as("s1"),
        sum((d38(col("x")) * col("x")).cast(DecimalType(38, 0))).as("q"))
    s.select(col("n"), col("n1"), (col("n") - col("n1")).as("n0"),
      (col("s1").cast("double") / col("n1").cast("double")).as("mean_en_chars"),
      ((col("sx") - col("s1")).cast("double") /
        (col("n") - col("n1")).cast("double")).as("mean_other_chars"),
      (Num.decToDouble((d38(col("n")) * col("s1") - d38(col("n1")) * col("sx"))
          .cast(DecimalType(38, 0))) /
        (sqrt(col("n1").cast("double") * (col("n") - col("n1")).cast("double")) *
          sqrt(Num.decToDouble((d38(col("n")) * col("q") - d38(col("sx")) * col("sx"))
            .cast(DecimalType(38, 0)))))).as("r_pb"))
  }

  /** HOSMER–LEMESHOW GOODNESS-OF-FIT (Hosmer & Lemeshow 1980, public) for
    * the q195 quality classifier against the English label, over q236's own
    * ten fixed score bins: HL = Σ_bins [(O₁−E₁)²/E₁ + (O₀−E₀)²/E₀] with
    * O₁ the observed positives and E₁ = Σp the expected — the TEST that
    * turns q236's per-bin calibration table into one χ²(bins−2) decision.
    * Determinism: E₁ folds 12-decimal-quantized scores exactly (the q236
    * recipe); each bin's two terms are a fixed double tree, quantized to 12
    * decimals before the ≤10-term exact fold. Bins where E₁ or E₀ is zero
    * carry no information and are excluded, with the used-bin count
    * reported (df = used − 2). Scale shape: q236's — one scan-speed scoring
    * pass, one PK join, one 10-group aggregate; everything after is ≤10 rows.
    */
  def hosmerLemeshow(spark: SparkSession, sfDir: String): DataFrame = {
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(28, 12))
    val bins = scoredWithLabel(spark, sfDir)
      .withColumn("bin", least(floor(col("score") * 10).cast("long"), lit(9L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("o1"),
        Num.decToDouble(sum(q12(col("score")))).as("e1"))
    val e0 = col("n").cast("double") - col("e1")
    val o0 = (col("n") - col("o1")).cast("double")
    val d1 = col("o1").cast("double") - col("e1")
    val d0 = o0 - e0
    val used = col("e1") > 0.0 && e0 > 0.0
    val term = when(used,
      q12(d1 * d1 / col("e1") + d0 * d0 / e0)).otherwise(lit(null))
    bins.agg(count(lit(1)).as("n_bins"),
        sum(when(used, 1L).otherwise(0L)).as("n_bins_used"),
        Num.decToDouble(sum(term)).as("hl_stat"))
      .select(col("n_bins"), col("n_bins_used"), col("hl_stat"),
        (col("n_bins_used") - 2L).as("df"))
  }

  /** COCHRAN'S Q TEST (Cochran 1950, public) across THREE binary English
    * detectors on the same documents — the k-sample generalization of
    * q274's McNemar pair: the q23 stopword heuristic (guessed = 'en'), the
    * q195 classifier at 0.5, and a length-≥300 strawman baseline. Q =
    * (k−1)·[k·ΣG_j² − (ΣG_j)²] / (k·ΣL − ΣL²) with G_j the per-detector
    * positive totals and L each document's row sum (0..3) — EVERY term an
    * exact BIGINT (ΣL and ΣL² fold in the same one aggregate), Q one
    * guarded double division, df = k−1. Rejecting says the three detectors
    * have genuinely different positive rates — run BEFORE pairwise
    * McNemars, which otherwise multiply α. Scale shape: one scan-speed
    * scoring pass (the langid regexes + the q195 score), two PK joins, ONE
    * aggregate; nothing after exceeds one row.
    */
  def cochransQ(spark: SparkSession, sfDir: String): DataFrame = {
    val lid = TextAnalysis.langId(spark, sfDir)
      .select(col("doc_id"),
        when(col("guessed_lang") === "en", 1L).otherwise(0L).as("a"))
    val clf = Curation.qualityClassifier(spark, sfDir)
      .select(col("doc_id"),
        when(col("score") >= 0.5, 1L).otherwise(0L).as("b"))
    val len = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        when(col("n_chars") >= 300, 1L).otherwise(0L).as("c"))
    val l = col("a") + col("b") + col("c")
    val s = lid.join(clf, "doc_id").join(len, "doc_id")
      .agg(count(lit(1)).as("n"),
        sum(col("a")).as("ga"), sum(col("b")).as("gb"), sum(col("c")).as("gc"),
        sum(l).as("sl"), sum(l * l).as("sll"))
    val num = lit(2L) * (lit(3L) * (col("ga") * col("ga") +
      col("gb") * col("gb") + col("gc") * col("gc")) -
      (col("ga") + col("gb") + col("gc")) * (col("ga") + col("gb") + col("gc")))
    val den = lit(3L) * col("sl") - col("sll")
    s.select(col("n"), col("ga").as("g_langid"), col("gb").as("g_clf"),
      col("gc").as("g_len"),
      when(den > 0L, num.cast("double") / den.cast("double")).as("q_stat"),
      lit(2L).as("df"))
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
