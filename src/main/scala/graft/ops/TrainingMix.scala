package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
      alpha: Double = 0.3, tokenBudget: Long = 1000000L): DataFrame =
    tempWeighted(sourceTokens(spark, sfDir), alpha)
      .select(col("source"), col("n_docs"), col("n_tokens"), col("weight"),
        floor(col("weight") * tokenBudget).cast("long").as("tokens_alloc"))

  /** Per-source exact doc/token counts — the aggregate the temperature chain
    * starts from, shared by q193 and the q335 curve; rides the session-wide
    * [[Corpus.docTokens]] census instead of its own corpus scan (r17).
    */
  private def sourceTokens(spark: SparkSession, sfDir: String): DataFrame =
    Corpus.docTokens(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_ws_toks")).as("n_tokens"))

  /** q193's weight arithmetic over a given per-source frame — n^α as
    * exp(α·ln n) with both transcendental outputs 12-decimal-bridged and
    * the normalizer folded as an exact DECIMAL(28,14) sum (see
    * [[temperatureMix]]'s scaladoc for the full determinism argument).
    * Output: (source, n_docs, n_tokens, weight).
    */
  private def tempWeighted(perSource: DataFrame, alpha: Double): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val lnT = graft.core.Num.decToDouble(
      log(col("n_tokens").cast("double")).cast(DecimalType(18, 12)))
    // p_raw = n^α reaches n itself at α = 1.0 (the q335 curve's top arm), so
    // the bridge needs integer headroom for a 100 TB source's token count:
    // DECIMAL(30,12) holds < 10^18 (vs (18,12)'s < 10^6, which overflowed to
    // NULL and silently dropped the source from the normalizer and min-cap
    // at roughly sf1). Widening only adds headroom — in-range values round
    // identically at 12 decimals, so every gated number is unchanged. The
    // normalizer fold widens to (38,14) for the same reason.
    val pRaw = graft.core.Num.decToDouble(
      exp(lit(alpha) * lnT).cast(DecimalType(30, 12)))
    val scored = perSource.withColumn("p_raw", pRaw)
    val tot = scored.agg(graft.core.Num.decToDouble(
      sum(col("p_raw").cast(DecimalType(38, 14)))).as("t"))
    scored.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("p_raw") / col("t")).as("weight"))
  }

  /** MIX SAMPLER — the executor that REALIZES [[domainMix]]'s solution (the
    * solver says how many tokens each (source, lang) cell owes; this emits
    * the deterministic per-cell readout of actually drawing them): each
    * cell's sampling rate is the exact integer permille
    * min(1000, (required·1000) div available) — infeasible cells cap at
    * keep-everything — and a document is drawn iff its content-addressed
    * hash bucket falls under its cell's rate (the q50 split mechanism, so
    * the draw is reproducible, join-free to audit, and independent of
    * row order — the only sampling that composes at 100 TB). Output per
    * cell: the rate, drawn docs/tokens, the requirement, and the achieved
    * ratio (NULL when a cell owes zero tokens — no division fabricated).
    *
    * Scale shape: the solver's cell frame broadcasts to the one corpus scan;
    * the draw is a per-row hash compare; one aggregate back to cell grain.
    */
  def mixSample(spark: SparkSession, sfDir: String,
      salt: String = "mix_v1"): DataFrame = {
    val rates = sampleRates(domainMix(spark, sfDir))
      .localCheckpoint(true) // two consumers: the draw join and the left spine
    val docs = Corpus.docTokens(spark, sfDir)
      .select(col("source"), col("lang"), col("n_ws_toks").as("nt"),
        Corpus.hashBucket(col("doc_id"), salt).as("h"))
    val drawn = docs.join(broadcast(rates), Seq("source", "lang"))
      .filter(col("h") < col("rate_permille"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_sampled_docs"),
        sum(col("nt")).as("sampled_tokens"))
    broadcast(rates).join(drawn, Seq("source", "lang"), "left")
      .select(col("source"), col("lang"), col("rate_permille"),
        coalesce(col("n_sampled_docs"), lit(0L)).as("n_sampled_docs"),
        coalesce(col("sampled_tokens"), lit(0L)).as("sampled_tokens"),
        col("required_tokens"),
        when(col("required_tokens") > 0L,
          coalesce(col("sampled_tokens"), lit(0L)).cast("double") /
            col("required_tokens").cast("double")).as("achieved_ratio"))
  }

  /** EPOCH-MULTIPLICITY MIX SAMPLER — the OVERSAMPLING half of the DoReMi
    * realization [[mixSample]] deliberately caps away (r16 verdict: a
    * weight > 1 cell under q336's ≤1000‰ draw silently under-delivers and
    * only achieved_ratio confesses): a cell owing more tokens than it has
    * draws every document k = required div available FULL times (k exact
    * integer epochs — the standard small-source upsampling of a real mix
    * job) plus a content-addressed remainder draw at the exact permille
    * (required mod available)·1000 div available, which is < 1000 by
    * construction. Output per cell: the plan (epochs, remainder_permille),
    * the remainder draw's exact doc/token counts, drawn_tokens =
    * epochs·available + remainder draw, n_draws (document draws counting
    * multiplicity), and achieved_ratio. The remainder can miss its target
    * by at most one permille bucket, so |achieved − 1| ≤ available/required
    * for every cell with required > 0 — a HARD bound (remainder_drawn and
    * the remainder target both live in [0, available]), spec-pinned; an
    * epoch-sampled mix never under-delivers a weight-2 cell by half the way
    * the capped sampler must.
    *
    * Zero-available cells ride [[sampleRates]]' guard semantics: epochs 0,
    * remainder_permille 1000 (keep everything, deliver nothing, ratio
    * confesses — never a NULL no-draw). Scale shape: identical to q336 —
    * the solver's cell plan broadcasts to the one [[Corpus.docTokens]]
    * census scan, the draw is a per-row hash compare, one aggregate back to
    * cell grain; epochs multiply COUNTS, never rows (no explode by k — a
    * 100-epoch cell costs the same one pass).
    */
  def mixSampleEpochs(spark: SparkSession, sfDir: String,
      salt: String = "mix_v1"): DataFrame = {
    val plan = epochPlan(domainMix(spark, sfDir))
      .localCheckpoint(true) // two consumers: the draw join and the left spine
    epochDraw(plan, Corpus.docTokens(spark, sfDir)
      .select(col("source"), col("lang"), col("n_ws_toks").as("nt"),
        Corpus.hashBucket(col("doc_id"), salt).as("h")))
  }

  /** The epoch-sampler draw + readout over any (plan, docs) pair — factored
    * out (r18) so q339's raw-census sampler and q370's graduated-pool
    * sampler realize their plans with the SAME arithmetic. `plan` is an
    * [[epochPlan]]-shaped checkpointed frame; `docs` is (source, lang, nt,
    * h) at whatever grain the plan priced.
    */
  private def epochDraw(plan: DataFrame, docs: DataFrame): DataFrame = {
    val drawn = docs
      .join(broadcast(plan.select(col("source"), col("lang"),
        col("remainder_permille"))), Seq("source", "lang"))
      .filter(col("h") < col("remainder_permille"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("rd"), sum(col("nt")).as("rt"))
    broadcast(plan).join(drawn, Seq("source", "lang"), "left")
      .select(col("source"), col("lang"), col("avail_tokens"),
        col("required_tokens"), col("epochs"), col("remainder_permille"),
        coalesce(col("rd"), lit(0L)).as("remainder_docs"),
        coalesce(col("rt"), lit(0L)).as("remainder_tokens"),
        (col("epochs") * col("avail_tokens") + coalesce(col("rt"), lit(0L)))
          .as("drawn_tokens"),
        (col("epochs") * col("n_docs") + coalesce(col("rd"), lit(0L)))
          .as("n_draws"),
        when(col("required_tokens") > 0L,
          (col("epochs") * col("avail_tokens") + coalesce(col("rt"), lit(0L)))
            .cast("double") / col("required_tokens").cast("double"))
          .as("achieved_ratio"))
  }

  /** The per-cell epoch plan off a [[domainMix]]-shaped frame — exact
    * integer arithmetic only, factored out so the zero-available and
    * upsample shapes are spec-pinnable on crafted frames (the q315 lesson).
    */
  private[graft] def epochPlan(mix: DataFrame): DataFrame =
    mix.select(col("source"), col("lang"), col("n_docs"), col("avail_tokens"),
      col("required_tokens"),
      when(col("avail_tokens") > 0L,
        expr("required_tokens div avail_tokens")).otherwise(0L).as("epochs"),
      when(col("avail_tokens") > 0L,
        expr("((required_tokens % avail_tokens) * 1000) div avail_tokens"))
        .otherwise(lit(1000L)).as("remainder_permille"))

  /** The per-cell draw rate off a [[domainMix]]-shaped frame, factored out so
    * the zero-available-token shape is spec-pinnable on a crafted frame (the
    * q315 lesson, r16 ADVICE): a cell whose documents all tokenize to zero
    * would make `required·1000 div avail` NULL and silently never draw —
    * the guard sends avail = 0 to the same keep-everything cap as an
    * infeasible cell (rate 1000: every zero-token doc drawn, zero tokens
    * delivered, achieved_ratio confesses 0 rather than NULL-hiding the cell).
    */
  private[graft] def sampleRates(mix: DataFrame): DataFrame =
    mix.select(col("source"), col("lang"), col("required_tokens"),
      when(col("avail_tokens") > 0L,
        least(lit(1000L), expr("(required_tokens * 1000) div avail_tokens")))
        .otherwise(lit(1000L)).as("rate_permille"))

  /** TEMPERATURE-FEASIBILITY CURVE — the tuning instrument for
    * [[temperatureMix]]'s α knob (the q315/q320/q326/q327 family, applied to
    * the mix tier): for each α, the LARGEST token budget the corpus can
    * serve without oversampling any source — B*(α) = min over sources of
    * ⌊avail_s / weight_s⌋ — plus the binding source (the one that caps the
    * mix; ties break to the lexicographically first) and B*'s share of the
    * corpus total. Flatter mixes (small α) upsample small sources hard, so
    * the smallest feed usually binds and B* collapses — this table is how
    * an operator picks α against a target budget BEFORE launching a
    * sampling job, instead of discovering the binding feed from its
    * exhaustion mid-run.
    *
    * Exactness: weights ride q193's bridged chain verbatim; each cap is one
    * IEEE division + floor of deterministic doubles; mins over exact longs.
    * Scale shape: ONE corpus aggregate (checkpointed |sources|-row frame),
    * then |alphas| × |sources| arithmetic — the α sweep never re-reads the
    * corpus.
    *
    * Edge bounds (r16 ADVICE): `alphas` must be non-empty (the union fold has
    * no zero element — enforced loudly below, not by a throw from `reduce`).
    * The cap `⌊avail/weight⌋` saturates at Long.MaxValue in Spark but DuckDB
    * errors on BIGINT overflow; a cap only exceeds 2⁶³ when weight <
    * avail/2⁶³ — i.e. a source holding under ~10⁻¹⁴ of a 10⁴⁹-token mix —
    * so only the default-α oracle gate relies on it, and the bound is
    * documented rather than branched.
    */
  def temperatureFeasibility(spark: SparkSession, sfDir: String,
      alphas: Seq[Double] = Seq(0.2, 0.3, 0.5, 0.7, 1.0)): DataFrame = {
    require(alphas.nonEmpty, "temperatureFeasibility needs at least one alpha")
    val perSource = sourceTokens(spark, sfDir).localCheckpoint(true)
    val tot = perSource.agg(sum(col("n_tokens")).as("tok_t"))
    alphas.map { a =>
      val caps = tempWeighted(perSource, a)
        .select(col("source"),
          floor(col("n_tokens").cast("double") / col("weight")).cast("long")
            .as("cap"))
      val capsMin = caps.crossJoin(broadcast(
        caps.agg(min(col("cap")).as("budget_max"))))
      capsMin.agg(
          count(lit(1)).as("n_sources"),
          min(col("budget_max")).as("budget_max"),
          min(when(col("cap") === col("budget_max"), col("source")))
            .as("binding_source"))
        .crossJoin(broadcast(tot))
        .select(lit(a).as("alpha"), col("n_sources"), col("budget_max"),
          col("binding_source"),
          (col("budget_max").cast("double") / col("tok_t").cast("double"))
            .as("feasible_share"))
    }.reduce(_ unionByName _)
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
  def domainMix(spark: SparkSession, sfDir: String): DataFrame =
    domainMixFromCells(domainCellsCached(spark, sfDir))

  /** DECONTAMINATED DOMAIN MIX — [[domainMix]]'s solver over the CLEAN
    * TRAINABLE POOL (non-eval documents q75 clears): the mix a sampling job
    * should actually draw from, since contaminated documents are dropped
    * before training and a solution computed over the raw census quietly
    * over-promises every cell whose feed carries contamination (q338's
    * profile shows how unevenly — a 20%-contaminated feed's cells lose a
    * fifth of their availability). Same independence-product target, same
    * exact arithmetic, same self-contained half-the-pool budget — only the
    * census changes, so the q332-vs-q344 diff IS the contamination
    * correction, cell by cell.
    *
    * Scale shape: verdicts ride the new `decontam_flags` memo and tokens
    * the `doc_tokens` memo — the cell census is one doc_id semi-join of two
    * narrow memoized frames + the |sources|·|langs| aggregate; the solver
    * is [[domainMixFromCells]] verbatim (third consumer).
    */
  def cleanDomainMix(spark: SparkSession, sfDir: String): DataFrame = {
    val clean = Curation.decontaminate(spark, sfDir)
      .filter(!col("is_contaminated")).select(col("doc_id"))
    domainMixFromCells(cellsFromTokens(
      Corpus.docTokens(spark, sfDir).join(clean, "doc_id")
        .select(col("source"), col("lang"), col("n_ws_toks").as("nt"))))
  }

  /** TRAINABLE-POOL MIX — the solver over the pool a real pipeline actually
    * trains on, i.e. the FULL curation chain composed: q55 near-dup
    * REPRESENTATIVES only (duplicate families contribute one member), q195
    * quality KEEPS (zq ≥ 0), and q75 decontamination CLEARS (non-eval,
    * no benchmark grams). [[domainMix]] prices the raw crawl, [[cleanDomainMix]]
    * subtracts contamination; this is the end-state census after every gate
    * has fired — the numbers the training job's sampler actually sees, and
    * the final answer to "what mix can we serve" (the q100-curation and
    * q332-mix tiers joined at the hip). Same exact solver arithmetic
    * ([[domainMixFromCells]], fourth consumer) and self-contained
    * half-the-pool budget.
    *
    * Scale shape: three doc_id semi-joins of narrow memoized/scan-speed
    * frames — the q55 label memo, the `decontam_flags` memo, and the
    * codegen'd per-row quality keep — against the `doc_tokens` census; then
    * the |sources|·|langs| aggregate and per-cell arithmetic.
    */
  def poolMix(spark: SparkSession, sfDir: String): DataFrame = {
    val reps = graft.ops.Graph.dupClusters(spark, sfDir)
      .filter(col("is_representative")).select(col("doc_id"))
    val clean = Curation.decontaminate(spark, sfDir)
      .filter(!col("is_contaminated")).select(col("doc_id"))
    val keeps = Curation.qualityClassifier(spark, sfDir)
      .filter(col("keep")).select(col("doc_id"))
    domainMixFromCells(cellsFromTokens(
      Corpus.docTokens(spark, sfDir)
        .join(reps, "doc_id").join(clean, "doc_id").join(keeps, "doc_id")
        .select(col("source"), col("lang"), col("n_ws_toks").as("nt"))))
  }

  /** GRADUATED-POLICY TRAINABLE POOL — [[poolMix]]'s solver with the
    * severity-aware decontamination remedy composed in (r17 verdict's top
    * item: poolMix drops every contaminated doc wholesale while q360 proves
    * passage-class docs are salvageable after excision): the same q55
    * dedup-representative and q195 quality gates, but the decontamination
    * gate GRADUATES — clean and quote-class docs enter whole, passage-class
    * docs enter at n_toks − excised_span (q334's exact min(w, len − w·p)
    * span arithmetic), wholesale-class docs drop. This is the census a
    * severity-aware pipeline's sampler actually sees; the q347-vs-q364 diff
    * IS what graduation rescues, cell by cell.
    *
    * Unit note: the census is in ALPHA tokens — the unit passage surgery is
    * priced in (excised spans are alpha-token intervals; q347's whitespace
    * census cannot absorb a subtractive span without mixing units) — so the
    * q347 comparison is policy-shaped, not unit-shaped: the spec pins
    * graduated-pool mass ≥ the binary-gated pool recomputed in the SAME
    * alpha unit, with the delta equal to the rescued quote + excised-passage
    * mass over the same gated docs (run = 0 ⇔ q75-clean, the q331
    * reconciliation, makes the binary arm exactly the sev = 'clean' slice).
    *
    * Scale shape: [[domainMixFromCells]] verbatim (fifth consumer) over a
    * census riding four session memos (the q55 label table, `leak_spans`,
    * `passage_flags`, `doc_tokens`) plus the codegen'd per-row quality
    * keeps — doc_id equi-joins of narrow frames, one |sources|·|langs|
    * aggregate, per-cell arithmetic.
    */
  def graduatedPoolMix(spark: SparkSession, sfDir: String, n: Int = 5,
      w: Int = 8, evalPermille: Int = 200, salt: String = "eval_v1"): DataFrame =
    domainMixFromCells(cellsFromTokens(
      graduatedPoolDocs(spark, sfDir, n, w, evalPermille, salt)
        .select(col("source"), col("lang"), col("nt"))))

  /** The per-doc GRADUATED-POOL frame (doc_id, source, lang, nt) — every
    * document entering [[graduatedPoolMix]]'s census with its graduated
    * token mass, factored out so the solver's census and the q370 sampler's
    * draw ride the SAME expression tree (the q268 convention at doc grain —
    * a sampler drawing from a different pool than its solver priced would
    * silently misdeliver).
    */
  private[graft] def graduatedPoolDocs(spark: SparkSession, sfDir: String,
      n: Int, w: Int, evalPermille: Int, salt: String): DataFrame = {
    val isEval = Corpus.hashBucket(col("doc_id"), salt) < evalPermille
    val reps = graft.ops.Graph.dupClusters(spark, sfDir)
      .filter(col("is_representative")).select(col("doc_id"))
    val keeps = Curation.qualityClassifier(spark, sfDir)
      .filter(col("keep")).select(col("doc_id"))
    val train = Corpus.docTokens(spark, sfDir).filter(!isEval)
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_alpha_toks").as("n_toks"))
    val removed = Curation.passageDecontaminate(spark, sfDir, n, w, evalPermille, salt)
      .filter(col("is_flagged"))
      .join(train.select(col("doc_id"), col("n_toks")), "doc_id")
      .groupBy(col("doc_id"))
      .agg(sum(least(lit(w.toLong), col("n_toks") - col("passage") * w))
        .as("removed"))
    Curation.leakSpans(spark, sfDir, n, evalPermille, salt)
      .select(col("doc_id"), col("longest_run_grams"))
      .join(train, "doc_id")
      .join(removed, Seq("doc_id"), "left")
      .withColumn("sev", Curation.severityClass(col("longest_run_grams")))
      .filter(col("sev") =!= "wholesale")
      .select(col("doc_id"), col("source"), col("lang"),
        when(col("sev") === "passage",
          col("n_toks") - coalesce(col("removed"), lit(0L)))
          .otherwise(col("n_toks")).as("nt"))
      .join(reps, "doc_id").join(keeps, "doc_id")
  }

  /** GRADUATED-MIX EPOCH SAMPLER — the severity-aware pipeline realized end
    * to end: [[mixSampleEpochs]]' epoch-multiplicity executor over
    * [[graduatedPoolMix]]'s solution, drawing from the SAME graduated pool
    * the solver priced ([[graduatedPoolDocs]], one expression tree for both)
    * — a passage-class document is drawn at its POST-EXCISION mass, a
    * wholesale document can never be drawn, so the sampler can no longer
    * over-promise a cell whose availability the blunt q75 gate would have
    * dropped wholesale. Output: q339's columns per cell (epochs, remainder
    * draw, drawn/required, achieved ratio), same hard
    * |achieved − 1| ≤ avail/required bound.
    *
    * Scale shape: the pool frame is computed once (checkpointed — the cell
    * census and the draw are its two consumers); the plan broadcasts to the
    * draw's per-row hash compare; one aggregate back to cell grain; epochs
    * multiply COUNTS, never rows (q339's argument verbatim).
    */
  def graduatedMixSample(spark: SparkSession, sfDir: String, n: Int = 5,
      w: Int = 8, evalPermille: Int = 200, salt: String = "eval_v1",
      mixSalt: String = "mix_v1"): DataFrame = {
    val pool = graduatedPoolDocs(spark, sfDir, n, w, evalPermille, salt)
      .select(col("source"), col("lang"), col("nt"),
        Corpus.hashBucket(col("doc_id"), mixSalt).as("h"))
      .localCheckpoint(true) // two consumers: the cell census and the draw
    val plan = epochPlan(domainMixFromCells(cellsFromTokens(
        pool.select(col("source"), col("lang"), col("nt")))))
      .localCheckpoint(true) // two consumers: the draw join and the left spine
    epochDraw(plan, pool)
  }

  /** GRADUATED EPOCH ACCOUNTING — [[epochAccounting]]'s fresh-vs-repeat
    * ledger over the GRADUATED sampler's plan (q345's question asked of the
    * pool a severity-aware pipeline actually serves): a curated pool is
    * smaller than the raw crawl, so the same independence target forces
    * more repetition — this row prices exactly how much (read beside q345:
    * the repeat-share delta IS the epoch cost of curation). One aggregate
    * over q370's |cells|-row frame.
    */
  def graduatedEpochAccounting(spark: SparkSession, sfDir: String, n: Int = 5,
      w: Int = 8, evalPermille: Int = 200, salt: String = "eval_v1",
      mixSalt: String = "mix_v1"): DataFrame =
    accountingFromCells(
      graduatedMixSample(spark, sfDir, n, w, evalPermille, salt, mixSalt))

  /** POOL-GATE ABLATION — which curation gate COSTS the most data: for each
    * of [[poolMix]]'s three gates (q55 dedup representatives, q195 quality
    * keep, q75 decontamination), the trainable pool with that ONE gate
    * removed, beside the full pool — extra_tokens is the gate's MARGINAL
    * price (what re-admitting its rejects would buy back), the number that
    * decides which gate to revisit when the pool comes up short of the
    * q335 budget. Removing the decontamination gate re-admits contaminated
    * TRAINING docs but never the eval slice itself (eval documents are not
    * trainable under any policy — documented, spec-pinned).
    *
    * Exactness: all counts/masses exact longs off one flag projection; one
    * IEEE division per ablation row. Scale shape: ONE pass — the three
    * gate flags join as narrow memoized/scan-speed frames onto the
    * `doc_tokens` census, a single 8-value aggregate computes all four
    * pools, and the 4-row output is literal projections of that one row
    * (never four corpus scans).
    */
  def poolAblation(spark: SparkSession, sfDir: String): DataFrame = {
    val isEval = Corpus.hashBucket(col("doc_id"), "eval_v1") < 200
    val reps = graft.ops.Graph.dupClusters(spark, sfDir)
      .filter(col("is_representative"))
      .select(col("doc_id"), lit(true).as("r"))
    val verd = Curation.decontaminate(spark, sfDir)
      .select(col("doc_id"), col("is_contaminated"))
    val keeps = Curation.qualityClassifier(spark, sfDir)
      .select(col("doc_id"), col("keep"))
    val flags = Corpus.docTokens(spark, sfDir)
      .join(reps, Seq("doc_id"), "left")
      .join(verd, Seq("doc_id"), "left")
      .join(keeps, Seq("doc_id"))
      .select(col("n_ws_toks").as("nt"),
        coalesce(col("r"), lit(false)).as("is_rep"),
        coalesce(!col("is_contaminated"), lit(false)).as("is_clean"),
        col("keep"), (!isEval).as("is_train"))
    def arm(cond: Column, tag: String) = Seq(
      sum(when(cond, 1L).otherwise(0L)).as(s"${tag}_docs"),
      sum(when(cond, col("nt")).otherwise(0L)).as(s"${tag}_toks"))
    val arms =
      arm(col("is_rep") && col("is_clean") && col("keep"), "full") ++
        arm(col("is_clean") && col("keep"), "nodedup") ++
        arm(col("is_rep") && col("is_clean"), "noquality") ++
        arm(col("is_rep") && col("is_train") && col("keep"), "nodecontam")
    // one row, four consumers below — checkpoint so the corpus pass is paid once
    val m = flags.agg(arms.head, arms.tail: _*).localCheckpoint(true)
    def row(tag: String, label: String) =
      m.select(lit(label).as("gate_removed"),
        col(s"${tag}_docs").as("n_docs"),
        col(s"${tag}_toks").as("pool_tokens"),
        (col(s"${tag}_toks") - col("full_toks")).as("extra_tokens"),
        when(col("full_toks") > 0L,
          (col(s"${tag}_toks") - col("full_toks")).cast("double") /
            col("full_toks").cast("double")).as("extra_share"))
    row("full", "none")
      .unionByName(row("nodedup", "dedup"))
      .unionByName(row("noquality", "quality"))
      .unionByName(row("nodecontam", "decontam"))
  }

  /** DATA-CONSTRAINED EPOCH ACCOUNTING — the one-row fresh-vs-repeat ledger
    * over [[mixSampleEpochs]]' plan (after the data-constrained-scaling
    * framing of arXiv 2305.16264: repeated epochs are worth less than fresh
    * tokens, so a budget planner needs the split BEFORE committing
    * compute): cells in the mix, cells that oversample (epochs ≥ 1), the
    * exact required/drawn token totals, unique tokens actually touched
    * (an oversampled cell touches its whole availability; an undersampled
    * one touches only its remainder draw), repeated tokens = drawn −
    * unique, and the repeat share (one IEEE division of exact BIGINTs).
    * A mix whose repeat share climbs past the scaling paper's ~4-epoch
    * value cliff needs more data, not more draws — this row says so in
    * two integers. Scale shape: one aggregate over q339's |cells|-row
    * frame; everything expensive underneath is already memoized.
    */
  def epochAccounting(spark: SparkSession, sfDir: String,
      salt: String = "mix_v1"): DataFrame =
    accountingFromCells(mixSampleEpochs(spark, sfDir, salt))

  /** q345's one-row ledger arithmetic over any [[mixSampleEpochs]]-shaped
    * cell frame — factored out (r18) so the raw-census ledger and q372's
    * graduated-pool ledger fold with the SAME expressions.
    */
  private def accountingFromCells(cells: DataFrame): DataFrame =
    cells
      .agg(
        count(lit(1)).as("n_cells"),
        sum(when(col("epochs") >= 1L, 1L).otherwise(0L)).as("n_cells_oversampled"),
        sum(col("required_tokens")).as("total_required_tokens"),
        sum(col("drawn_tokens")).as("total_drawn_tokens"),
        sum(when(col("epochs") >= 1L, col("avail_tokens"))
          .otherwise(col("remainder_tokens"))).as("unique_tokens"))
      .select(col("n_cells"), col("n_cells_oversampled"),
        col("total_required_tokens"), col("total_drawn_tokens"),
        col("unique_tokens"),
        (col("total_drawn_tokens") - col("unique_tokens")).as("repeated_tokens"),
        when(col("total_drawn_tokens") > 0L,
          (col("total_drawn_tokens") - col("unique_tokens")).cast("double") /
            col("total_drawn_tokens").cast("double")).as("repeat_share"))

  /** The corpus-sized (source, lang) census MEMOIZED once per (session,
    * scale factor) — the round's two-consumer rule: q332's solver and
    * q336's sampler (which re-derives rates through the solver) were each
    * paying the full tokenize+aggregate. |sources|·|langs| rows of four
    * values; cache_paid/cache_hit attribution rides the shared registry.
    */
  private val domainCellsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def domainCellsCached(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.cached(domainCellsCache, "domain_cells", spark, sfDir)(
      // the batch payer aggregates the doc_tokens census (r17) — same exact
      // per-doc longs, one fewer corpus scan; the streaming twin still
      // tokenizes in-stream via [[domainCells]]
      cellsFromTokens(Corpus.docTokens(spark, sfDir)
        .select(col("source"), col("lang"), col("n_ws_toks").as("nt"))))

  /** The (source, lang) cell aggregate underlying [[domainMix]] — factored
    * out so the batch solver and its streaming twin build cells from the
    * SAME expression tree over any documents relation (the q268 convention;
    * in a stream this groupBy IS the state, |sources|·|langs| rows).
    */
  private[graft] def domainCells(docs: DataFrame): DataFrame =
    cellsFromTokens(docs.select(col("source"), col("lang"),
      TextAnalysis.qualityTokens.cast("long").as("nt")))

  /** The cell groupBy over any (source, lang, nt) projection — one spelling
    * whether nt comes from the in-scan tokenizer (streaming) or the
    * [[Corpus.docTokens]] census (batch memo payer).
    */
  private def cellsFromTokens(tok: DataFrame): DataFrame =
    tok.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("avail_tokens"))

  /** The solver arithmetic over a finalized cell frame — shared verbatim by
    * the batch operator and the streaming twin's drain-side finisher.
    */
  private[graft] def domainMixFromCells(cells: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
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
