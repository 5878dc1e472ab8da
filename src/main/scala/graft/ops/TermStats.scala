package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Num, Tables}

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

  /** BM25 defaults, shared with the oracle builder in [[graft.SparkEntry]] so
    * the SQL twin interpolates the SAME doubles the operator folds with —
    * changing a default here changes both sides in lockstep.
    */
  val Bm25K1: Double = 1.2
  val Bm25B: Double = 0.75
  val Bm25DefaultTerms: Seq[String] = Seq("spark", "join", "window")

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
    // scan-parallelism floor (r19, Tables.spreadScan scaladoc)
    val docTerms = Tables.spreadScan(Tables.documents(spark, sfDir), col("doc_id"))
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

  /** BM25 relevance of every document against a fixed query-term set — the
    * retrieval scorer (Lucene's idf form: ln((N−df+0.5)/(df+0.5)+1)). The
    * [[tfidfTopTerms]] scaladoc's ln caution is handled head-on here: both
    * engines' ln agreed bit-exactly on probe inputs, the idf arguments are
    * a small finite set of rationals (one per distinct df), and the gate
    * verifies the equality per dataset; per-term scores still round to
    * decimal before the per-document sum so partitioning cannot reorder
    * the fold. Only rows containing a query term survive the first filter,
    * so everything after the token explode is query-sized, not corpus-sized.
    */
  def bm25Scores(spark: SparkSession, sfDir: String,
      terms: Seq[String] = Bm25DefaultTerms,
      k1: Double = Bm25K1, b: Double = Bm25B): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("len"))
    val corpus = docs.agg(
      count(lit(1)).as("n_docs"),
      (Num.decToDouble(sum(col("len").cast(DecimalType(18, 0))))
        / count(lit(1))).as("avg_len"))
    val tf = docs
      .select(col("doc_id"), col("len"), explode(col("toks")).as("t"))
      .filter(col("t").isin(terms: _*))
      .groupBy(col("doc_id"), col("len"), col("t"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    // ln is the one non-correctly-rounded function in the formula (JVM
    // Math.log and libm may disagree by 1 ulp); rounding its OUTPUT to 12
    // decimals through the decimal bridge absorbs that slop — a flip now
    // needs a 1-ulp disagreement AND a 12-digit tie at once
    val idf = Num.decToDouble(
      log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
        .cast(org.apache.spark.sql.types.DecimalType(18, 12)))
    val norm = lit(1.0) - lit(b) + lit(b) * col("len") / col("avg_len")
    val termScore = idf * (col("tf") * lit(k1 + 1.0)) / (col("tf") + lit(k1) * norm)
    tf.join(df, "t")
      .crossJoin(broadcast(corpus))
      .groupBy(col("doc_id"))
      .agg(
        Num.decToDouble(sum(termScore.cast(org.apache.spark.sql.types.DecimalType(28, 14)))).as("score"),
        count(lit(1)).as("n_terms_matched"))
  }

  /** The higher-order array-function surface in one pass over the token
    * arrays — transform / filter / aggregate(fold) / distinct+sort /
    * contains / slice, all codegen-free lambda evaluation INSIDE the row
    * (zero shuffle, zero explode: the per-doc fold replaces an
    * explode+groupBy for per-document reductions — the same
    * stay-in-the-row trick the Gopher repetition signals use at corpus
    * scale). Array-typed outputs are stringified so the oracle compares
    * scalars only.
    */
  def arrayFunctionShowcase(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(filter(col("toks"), t => length(t) > 4)).cast("long").as("n_long"),
        aggregate(transform(col("toks"), t => length(t)), lit(0),
          (acc, x) => acc + x).cast("long").as("total_chars"),
        // get() (0-based, NULL out of bounds) not element_at: a zero-token
        // document must yield NULL, not an ANSI INVALID_ARRAY_INDEX error
        get(array_sort(array_distinct(transform(col("toks"),
          t => upper(t)))), lit(0)).as("first_upper"),
        array_contains(col("toks"), "spark").as("mentions_spark"),
        concat_ws(" ", slice(col("toks"), 1, 3)).as("head3"))

  /** Hybrid retrieval: reciprocal-rank fusion of the lexical arm
    * ([[bm25Scores]]) and the semantic arm (exact cosine to query vector 0,
    * [[Similarity.cosineToQuery]]) — the two-tower search shape every
    * modern retrieval stack runs, as one oracle-gated query. RRF is pure
    * rank arithmetic (score = Σ 1/(60+rank)), and both arms' scores are
    * already cross-engine bit-exact (decimal-bridged BM25; integer-scaled
    * cosine), so the fused ranking is deterministic end to end — rank
    * fusion is exactly the regime where 1-ulp score noise would silently
    * reorder results, which is why both arms were built exact first.
    * Documents in only one arm keep a NULL rank there and contribute a
    * single RRF term (standard RRF-over-union semantics).
    *
    * Both arms' exact global ranks come from [[Relational.twoPhaseRank]]
    * (value-range buckets + prefix-summed offsets + bucket-local sorts) —
    * RRF needs exact ranks and the two-phase plan reproduces the
    * single-task `row_number() OVER (ORDER BY score DESC, doc_id)` window
    * deterministically without ever funneling a full scored corpus through
    * one task (the round-10 weak finding, closed here).
    */
  def hybridSearch(spark: SparkSession, sfDir: String): DataFrame = {
    val lex = Relational.twoPhaseRank(
        bm25Scores(spark, sfDir).select(col("doc_id"), col("score")),
        "score", "doc_id", "r_lex", descending = true)
      .select(col("doc_id"), col("r_lex"))
    val sem = Relational.twoPhaseRank(
        Similarity.cosineToQuery(spark, sfDir, queryId = 0L)
          .select(col("doc_id"), col("cosine")),
        "cosine", "doc_id", "r_sem", descending = true)
      .select(col("doc_id"), col("r_sem"))
    def arm(r: Column) = coalesce(lit(1.0) / (lit(60.0) + r), lit(0.0))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("r_lex"), col("r_sem"),
        (arm(col("r_lex")) + arm(col("r_sem"))).as("rrf"))
  }

  /** Shannon entropy of each source's token distribution (plus vocabulary
    * and token totals) — the diversity signal a corpus-mix designer reads
    * before weighting sources. p·ln p terms round to decimal before the
    * exact per-source sum; one token-keyed partial aggregate is the only
    * corpus-sized job.
    */
  def tokenEntropyBySource(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val counts = Tables.documents(spark, sfDir)
      .select(col("source"), explode(tokens(col("text"))).as("t"))
      .groupBy(col("source"), col("t"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy("source")))
    val p = col("cnt").cast("double") / col("total")
    // ln(p) rounds to 12 decimals first for the same 1-ulp reason as
    // bm25Scores' idf (see there); the term then rounds to (28,14) for the
    // exact order-independent fold
    val lnP = Num.decToDouble(log(p).cast(org.apache.spark.sql.types.DecimalType(18, 12)))
    counts.groupBy(col("source"))
      .agg(
        max(col("total")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        Num.decToDouble(sum((-(p * lnP)).cast(org.apache.spark.sql.types.DecimalType(28, 14))))
          .as("entropy"))
  }

  /** Materialized inverted index for the frequent vocabulary: per term, its
    * document frequency and the top-`topK` postings by (tf desc, doc asc),
    * serialized as a comma-joined doc-id string (a STRING because the
    * correctness gate hash-compares cell values — an array column's
    * cross-engine ordering/encoding is the kind of ambiguity a posting
    * STRING removes for free). This is the retrieval-side artifact BM25
    * (q153) scores against rebuilt as a table: build once, broadcast to
    * searchers. Shuffle shape: tokenize → (term, doc) partial-agg counts →
    * per-term top-k window over (term, doc, tf) triples only — postings are
    * bounded by topK BEFORE the collect_list, so no group ever aggregates
    * more than topK rows of payload, and the `minDf` cut kills the long
    * hapax tail in the same aggregate that computes df.
    */
  /** Characteristic vocabulary per SOURCE via smoothed log-odds ratio
    * (the Monroe et al. "fightin' words" statistic, add-one smoothed):
    * for each frequent term and source,
    *   δ = ln((c_s+1)/(n_s−c_s+1)) − ln((c_r+1)/(n_r−c_r+1)),
    * where c_s/n_s count the term/all tokens in the source and c_r/n_r in
    * the REST of the corpus — the "what words distinguish this slice"
    * report a corpus audit runs per domain. Top-5 per source by (δ desc,
    * term asc). Token counts reduce map-side to |sources|×|vocab| before
    * anything joins; source totals and the global totals ride broadcast
    * frames; both ln's cross the 12-decimal bridge and δ is one IEEE
    * subtraction of bridged doubles.
    */
  def logOddsTerms(spark: SparkSession, sfDir: String, minDf: Int = 50,
      topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val tok = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), explode(tokens(col("text"))).as("term"))
    val df = tok.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val bySource = tok.join(broadcast(df.select("term")), "term")
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c_s"))
    val srcTotals = tok.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val global = bySource.groupBy(col("term")).agg(sum(col("c_s")).as("c_g"))
    val allTotal = srcTotals.agg(sum(col("n_s")).as("n_g"))
    def lnB(c: org.apache.spark.sql.Column) =
      graft.core.Num.decToDouble(log(c).cast(org.apache.spark.sql.types.DecimalType(18, 12)))
    val scored = bySource
      .join(broadcast(srcTotals), "source")
      .join(broadcast(global), "term")
      .crossJoin(broadcast(allTotal))
      .select(col("source"), col("term"), col("c_s"),
        (lnB((col("c_s") + 1).cast("double") / (col("n_s") - col("c_s") + 1)) -
          lnB((col("c_g") - col("c_s") + 1).cast("double") /
            (col("n_g") - col("n_s") - (col("c_g") - col("c_s")) + 1))).as("delta"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("delta").desc, col("term"))).cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("source"), col("term"), col("c_s"), col("delta"), col("rnk"))
  }

  /** Zipf exponent per language: least-squares slope of ln(freq) on
    * ln(rank) over the top-`topN` ranked terms — the vocabulary-shape
    * fingerprint (natural text ≈ −1; templated/synthetic text flattens) a
    * corpus audit tracks per slice. All four regression sums run in the
    * exact decimal domain over 12-decimal-bridged ln's (the q143 recipe),
    * so slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) is two bridged sums divided once.
    * The ranking window sees only |lang|×|vocab| aggregated rows.
    */
  /** PMI COLLOCATIONS per language — the strongest adjacent-word
    * associations (Church & Hanks 1990, public), the phrase-mining /
    * tokenizer-vocabulary primitive: PMI(a,b) = ln(c_ab·N / (c_a·c_b)) over
    * BIGRAM-POSITION marginals (c_a = bigrams starting with a, c_b =
    * bigrams ending with b, N = bigrams in the language — one consistent
    * sample space, every count an exact int). Each ln rides the 12-decimal
    * bridge and the four terms fold in ONE fixed tree, so the doubles are
    * cross-engine identical; `minCount` kills the hapax pairs PMI
    * notoriously over-ranks. Top-k per language via the NATIVE
    * [[graft.plans.TopKPerGroup]] operator (bounded heaps — never a
    * per-language sort), bigram text as the total-order tiebreak.
    * Scale shape: one tokenize+explode scan → per-(lang, bigram) counts;
    * the position marginals and N aggregate the ALREADY-AGGREGATED bigram
    * frame, and the top-k never moves more than |langs|·k rows.
    */
  def pmiCollocations(spark: SparkSession, sfDir: String,
      minCount: Int = 5, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def lnB(c: Column): Column =
      graft.core.Num.decToDouble(log(c.cast("double")).cast(org.apache.spark.sql.types.DecimalType(18, 12)))
    // NULL lang rides as an explicit NUL category — the marginal equi-joins
    // would otherwise drop it silently in both engines (the q199 class).
    // The token array is PROJECTED FIRST (the q110 shape): inlining
    // tokens(text) into the bigram lambda re-evaluates the regexp per
    // element_at reference — measured 8.5 s for a 265k-bigram explode vs
    // ~1 s with the array materialized as its own column.
    val bi = Tables.documents(spark, sfDir)
      .select(coalesce(col("lang"), lit("\u0000")).as("lang"),
        tokens(col("text")).as("toks"))
      .select(col("lang"),
        explode(LanguageModel.bigramsOf(col("toks"))).as("bigram"))
    // FOUR lineages (pair counts + two marginals + N) all need the bigram
    // explode+aggregate; persisting the aggregated (vocab-sized, narrow)
    // frame pays the explode ONCE — measured 7.1 s → explode-family class
    // (~2 s) in-suite. Vocab-sized state is the same bounded class every
    // marginal table here already materializes.
    val cab = bi.groupBy(col("lang"), col("bigram")).agg(count(lit(1)).as("c_ab"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cab.count() // materialize: one explode pass feeds all four consumers
    val ca = cab.groupBy(col("lang"), col("w1")).agg(sum(col("c_ab")).as("c_a"))
    val cb = cab.groupBy(col("lang"), col("w2")).agg(sum(col("c_ab")).as("c_b"))
    val nb = cab.groupBy(col("lang")).agg(sum(col("c_ab")).as("n_bi"))
    val scored = cab.filter(col("c_ab") >= minCount)
      .join(ca, Seq("lang", "w1"))
      .join(cb, Seq("lang", "w2"))
      .join(broadcast(nb), Seq("lang"))
      .select(col("lang"), col("bigram"), col("c_ab"), col("c_a"), col("c_b"),
        col("n_bi"),
        ((lnB(col("c_ab")) + lnB(col("n_bi"))) - lnB(col("c_a")) - lnB(col("c_b")))
          .as("pmi"))
    val result = graft.plans.TopKPerGroup.topK(scored, Seq("lang"),
      Seq(("pmi", true), ("bigram", false)), k)
      .drop("w1", "w2")
      .localCheckpoint(true)
    cab.unpersist()
    result
  }

  /** TRAIN/VALID TOKEN-DISTRIBUTION DIVERGENCE — Jensen–Shannon plus both
    * KL directions between the unigram distributions of the q50 hash
    * split's train and valid slices: the release-gate audit that catches a
    * split whose validation set is not distributionally representative
    * (the content-level companion to q232's membership leakage — q232 asks
    * "did documents leak", this asks "do the slices even speak the same
    * corpus"). Laplace +1 smoothing over the JOINT vocabulary keeps every
    * log finite with no data-dependent epsilon; p and q are single
    * divisions of exact ints; each p·ln(·) term is a fixed tree over the
    * 12-decimal ln bridge, and only the term SUMS fold through the
    * quantized grid. Split membership is the PURE hash function of doc_id
    * (no join with a split table — zero extra shuffle).
    * Scale shape: one tokenize+explode scan → one |vocab|-row aggregate →
    * per-term arithmetic → one 6-number fold. The 100 TB JS divergence.
    */
  def splitDivergence(spark: SparkSession, sfDir: String,
      salt: String = "split_v1"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def lnB(c: Column): Column =
      graft.core.Num.decToDouble(log(c).cast(org.apache.spark.sql.types.DecimalType(18, 12)))
    def q12(c: Column): Column = c.cast("string").cast(org.apache.spark.sql.types.DecimalType(28, 12))
    val bucket = Corpus.hashBucket(col("doc_id"), salt)
    val split = when(bucket < 900, "train").when(bucket < 950, "valid")
      .otherwise("test")
    val tc = Tables.documents(spark, sfDir)
      .select(split.as("split"), explode(tokens(col("text"))).as("term"))
      .filter(col("split").isin("train", "valid"))
      .groupBy(col("term"))
      .agg(sum(when(col("split") === "train", 1L).otherwise(0L)).as("ct"),
        sum(when(col("split") === "valid", 1L).otherwise(0L)).as("cv"))
    val tot = tc.agg(sum(col("ct")).as("nt"), sum(col("cv")).as("nv"),
      count(lit(1)).as("v"))
    val p = (col("ct") + 1).cast("double") / (col("nt") + col("v")).cast("double")
    val q = (col("cv") + 1).cast("double") / (col("nv") + col("v")).cast("double")
    val terms = tc.crossJoin(broadcast(tot))
      .select(col("nt"), col("nv"), col("v"),
        (p * lnB(lit(2.0) * p / (p + q))).as("jt"),
        (q * lnB(lit(2.0) * q / (p + q))).as("jv"),
        (p * lnB(p / q)).as("kt"),
        (q * lnB(q / p)).as("kv"))
    terms.groupBy(col("nt"), col("nv"), col("v"))
      .agg(
        graft.core.Num.decToDouble(sum(q12(col("jt")))).as("__jt"),
        graft.core.Num.decToDouble(sum(q12(col("jv")))).as("__jv"),
        graft.core.Num.decToDouble(sum(q12(col("kt")))).as("kl_train_valid"),
        graft.core.Num.decToDouble(sum(q12(col("kv")))).as("kl_valid_train"))
      .select(col("v").as("n_vocab"), col("nt").as("n_train_tokens"),
        col("nv").as("n_valid_tokens"),
        (lit(0.5) * (col("__jt") + col("__jv"))).as("js_div"),
        col("kl_train_valid"), col("kl_valid_train"))
  }

  def zipfSlope(spark: SparkSession, sfDir: String, topN: Int = 100): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val freq = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("lang"), col("term")).agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("n").desc, col("term"))))
      .filter(col("rank") <= topN)
    def lnB(c: org.apache.spark.sql.Column) =
      graft.core.Num.decToDouble(log(c).cast(org.apache.spark.sql.types.DecimalType(18, 12)))
    val xy = freq.select(col("lang"),
      lnB(col("rank").cast("double")).as("x"), lnB(col("n").cast("double")).as("y"))
    def s(c: org.apache.spark.sql.Column) =
      graft.core.Num.decToDouble(sum(c.cast(org.apache.spark.sql.types.DecimalType(28, 14))))
    xy.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_points"), s(col("x")).as("sx"), s(col("y")).as("sy"),
        s(col("x") * col("y")).as("sxy"), s(col("x") * col("x")).as("sxx"))
      .select(col("lang"), col("n_points"),
        ((col("n_points") * col("sxy") - col("sx") * col("sy")) /
          (col("n_points") * col("sxx") - col("sx") * col("sx"))).as("zipf_slope"))
  }

  /** Pointwise mutual information over frequent term PAIRS — the phrase /
    * collocation detector (word2vec's preprocessing step, association
    * mining over documents instead of q169's baskets):
    * pmi(a,b) = ln(P(a,b) / (P(a)·P(b))) = ln(n_ab·N / (df_a·df_b)).
    * The vocabulary is cut to df ≥ `minDf` BEFORE pair generation, so the
    * per-document pair fan-out is bounded by the frequent-term count per
    * doc, not vocabulary² — the Apriori discipline again; the pair count
    * then prunes at `minPair` in its own partial aggregate. The ln argument
    * is one IEEE division of exact long products, and ln itself crosses the
    * 12-decimal bridge (the q110/q153 convention) so both engines emit the
    * identical double.
    */
  def termPmi(spark: SparkSession, sfDir: String, minDf: Int = 50,
      minPair: Int = 25): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // scan-parallelism floor (r19, Tables.spreadScan scaladoc)
    val docTerm = Tables.spreadScan(Tables.documents(spark, sfDir), col("doc_id"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .distinct()
      .persist()
    val df = docTerm.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val frequent = docTerm.join(broadcast(df), "term")
    val nDocs = Tables.documents(spark, sfDir).agg(count(lit(1)).as("n_docs"))
    val pairs = frequent.as("a").join(frequent.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.term") < col("b.term"))
      .groupBy(col("a.term").as("term_a"), col("b.term").as("term_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPair)
    val out = pairs
      .join(broadcast(df.select(col("term").as("term_a"), col("df").as("df_a"))), "term_a")
      .join(broadcast(df.select(col("term").as("term_b"), col("df").as("df_b"))), "term_b")
      .crossJoin(broadcast(nDocs))
      .select(col("term_a"), col("term_b"), col("n_ab"), col("df_a"), col("df_b"),
        Num.decToDouble(
          log((col("n_ab") * col("n_docs")).cast("double") /
            (col("df_a") * col("df_b")))
            .cast(org.apache.spark.sql.types.DecimalType(18, 12))).as("pmi"))
      .localCheckpoint(true)
    docTerm.unpersist()
    out
  }

  def invertedIndex(spark: SparkSession, sfDir: String, minDf: Int = 50,
      topK: Int = 5): DataFrame = {
    val tf = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    tf
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("term")).orderBy(col("tf").desc, col("doc_id"))))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(when(col("rn") <= topK,
          struct(col("rn"), col("doc_id"))))).as("top"))
      .filter(col("df") >= minDf)
      .select(col("term"), col("df"),
        concat_ws(",", transform(col("top"),
          x => x.getField("doc_id").cast("string"))).as("top_docs"))
  }

  /** TERM OVERDISPERSION (the Church–Gale 1995 burstiness observation,
    * public): variance-to-mean ratio of a term's per-document counts
    * across the WHOLE corpus — VMR ≈ 1 is Poisson scatter (function
    * words); VMR ≫ 1 is a bursty topical term that clumps into few
    * documents. The q212 statistic at TERM granularity, and a
    * boilerplate/template detector beside q215's novelty. ENTIRELY exact
    * until one division: with T = Σtf and S = Σtf² over the N docs
    * (absent docs contribute zero to both, so zeros never materialize),
    * VMR = var/mean = (N·S − T²)/(N·T) — numerator and denominator exact
    * BIGINTs, one double division (N·S ≈ 10¹² at sf0.1, safely inside
    * int64; at extreme corpus scale the same identity folds in
    * DECIMAL(38,0)). Top-`k` by VMR via distributed TakeOrdered
    * (tie-break on term), df ≥ `minDf` kills one-doc noise.
    */
  def termBurstiness(spark: SparkSession, sfDir: String,
      minDf: Int = 5, k: Int = 50): DataFrame = {
    val tf = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val n = Tables.documents(spark, sfDir).agg(count(lit(1)).as("n_docs"))
    val perTerm = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("t_total"),
        sum(col("tf") * col("tf")).as("s2"))
      .filter(col("df") >= minDf)
      .crossJoin(broadcast(n))
    perTerm.select(col("term"), col("df"), col("t_total"),
        col("n_docs"),
        ((col("n_docs") * col("s2") - col("t_total") * col("t_total"))
          .cast("double") /
          (col("n_docs") * col("t_total")).cast("double")).as("vmr"))
      .orderBy(col("vmr").desc, col("term"))
      .limit(k)
  }

  /** PER-SOURCE UNIGRAM KL DIVERGENCE from the whole-corpus distribution —
    * KL(P_s ‖ P) = Σ_t (c_st/N_s)·ln((c_st/N_s)/(c_t/N)) — the topical-
    * outlier detector a mix designer reads next to q92's source shares: a
    * source whose unigrams diverge hard is a different REGISTER (code, spam,
    * another domain) and shifts the training mix even at a small share.
    * Every probability is a ratio of exact BIGINT counts (a source's terms
    * are a subset of the corpus', so q > 0 always and the sum needs no
    * smoothing); the ln argument is a fixed three-division double tree
    * (magnitude-safe at any corpus size — never a product of counts), ln
    * crosses the 12-decimal bridge, each term quantizes to 12 decimals
    * before the exact per-source fold. Scale shape: ONE tokenize+aggregate
    * to (source, term) counts; the global margin is a second small
    * aggregate OF THAT FRAME (not a rescan); everything after runs on
    * |vocab|·|sources| rows.
    */
  def sourceDivergence(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(28, 12))
    def lnB(c: Column): Column =
      Num.decToDouble(log(c).cast(DecimalType(18, 12)))
    val st = Tables.documents(spark, sfDir)
      .select(col("source"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c_st"))
    val termTot = st.groupBy(col("term")).agg(sum(col("c_st")).as("c_t"))
    val srcTot = st.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val n = srcTot.agg(sum(col("n_s")).as("n"))
    st.join(termTot, "term").join(broadcast(srcTot), "source")
      .crossJoin(broadcast(n))
      .select(col("source"), col("n_s"),
        q12((col("c_st").cast("double") / col("n_s").cast("double")) *
          lnB((col("c_st").cast("double") / col("n_s").cast("double")) /
            (col("c_t").cast("double") / col("n").cast("double")))).as("t"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"),
        Num.decToDouble(sum(col("t"))).as("kl_from_corpus"))
  }

  /** PER-SOURCE UNIGRAM ENTROPY AND PERPLEXITY — H_s = −Σ p·ln p over each
    * source's own term distribution and PP = e^{H_s}, the "effective
    * vocabulary size" a tokenizer/compressor sees per feed: a source whose
    * perplexity collapses is template/boilerplate text (the corpus-level
    * twin of q76's per-doc repetition signals), one whose perplexity spikes
    * is noise or another language — read NEXT TO q295's KL, which says
    * "different from the corpus" but not "degenerate on its own". The q282
    * entropy bridges verbatim; perplexity crosses exp through a 9-decimal
    * quantization (the q195 discipline — H ≤ ln|vocab| keeps e^H inside
    * the DECIMAL(18,9) grid for any real vocabulary). Scale shape: the
    * same ONE tokenize+aggregate as q295; everything after runs on
    * |vocab|·|sources| rows.
    */
  def sourcePerplexity(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(28, 12))
    def lnB(c: Column): Column =
      Num.decToDouble(log(c).cast(DecimalType(18, 12)))
    val st = Tables.documents(spark, sfDir)
      .select(col("source"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c_st"))
    val srcTot = st.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    st.join(broadcast(srcTot), "source")
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        (-Num.decToDouble(sum(q12(
          (col("c_st").cast("double") / col("n_s").cast("double")) *
            lnB(col("c_st").cast("double") / col("n_s").cast("double"))))))
          .as("h_unigram"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("h_unigram"),
        Num.decToDouble(exp(col("h_unigram")).cast(DecimalType(18, 9)))
          .as("perplexity"))
  }

  /** GOOD–TURING COVERAGE per source (Good 1953, public): the Turing
    * estimate of UNSEEN probability mass is the singleton share n₁/N, so
    * coverage = 1 − n₁/N — "how much of this feed's true vocabulary have we
    * actually seen", the number that says whether more crawl of a source
    * buys new tokens or repeats. ENTIRELY exact until one division: n₁
    * (hapax count), n₂ (dis legomena, the next spectrum point Good–Turing
    * smoothing needs), vocab and N are exact BIGINTs off the one
    * (source, term) aggregate q295/q298 already define. Scale shape: ONE
    * tokenize+aggregate; everything after runs on |vocab|·|sources| rows.
    */
  def goodTuringCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val st = Tables.documents(spark, sfDir)
      .select(col("source"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c_st"))
    st.groupBy(col("source"))
      .agg(sum(col("c_st")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(when(col("c_st") === 1L, 1L).otherwise(0L)).as("n_hapax"),
        sum(when(col("c_st") === 2L, 1L).otherwise(0L)).as("n_dis"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        col("n_hapax"), col("n_dis"),
        (lit(1.0) - col("n_hapax").cast("double") /
          col("n_tokens").cast("double")).as("coverage"))
  }

  /** VOCABULARY-GROWTH SERIES per source — [[goodTuringCoverage]]'s "does
    * more crawl buy new tokens" question TIME-SLICED, the crawl-budget
    * planner: documents are dealt into `nBatches` deterministic crawl batches
    * (content-addressed hash of doc_id — the corpus has no arrival timestamp,
    * so the batch stands in for a crawl increment exactly as q50's hash split
    * stands in for a real split), and each (source, batch) row reports the
    * batch's token volume, its distinct vocabulary, how many of those terms
    * are NEW (first batch, per source, in which the term appears), the
    * cumulative vocabulary so far, and the new-term rate per token. A source
    * whose new_term_rate has flattened is crawled out; one still climbing
    * deserves budget.
    *
    * Exactness: everything is an exact BIGINT off ONE (source, term, batch)
    * aggregate until the one rate division per row. Scale shape: the explode
    * is reduced map-side to the per-cell aggregate; first-seen is a min over
    * the (source, term) frame; the cumulative sum is a window over the
    * |sources|·|batches| frame, never over terms. Batches with no documents
    * for a source are absent (sparse by construction, like q278's matrix).
    */
  def vocabularyGrowth(spark: SparkSession, sfDir: String, nBatches: Int = 8,
      salt: String = "crawl_v1"): DataFrame =
    growthFromCells(
      vocabCells(Tables.documents(spark, sfDir), nBatches, salt))

  /** The (source, term, batch, n) cell aggregate underlying
    * [[vocabularyGrowth]] — factored out so the batch operator and its
    * streaming twin build their cells from the SAME expression tree over any
    * documents relation (the q268 shared-definition convention): in a
    * stream, this groupBy IS the state, bounded by vocabulary × batches
    * rather than the corpus.
    */
  private[graft] def vocabCells(docs: DataFrame, nBatches: Int,
      salt: String): DataFrame =
    docs.select(col("source"),
        (Corpus.hashBucket(col("doc_id"), salt) % nBatches.toLong).as("batch"),
        explode(tokens(col("text"))).as("term"))
      .groupBy(col("source"), col("term"), col("batch"))
      .agg(count(lit(1)).as("n"))

  /** The growth-series arithmetic over a finalized cell frame (first-seen =
    * min batch, cumulative vocabulary, new-term rate) — shared verbatim by
    * the batch operator and the streaming twin's drain-side finisher.
    */
  private[graft] def growthFromCells(cells: DataFrame): DataFrame = {
    val perBatch = cells.groupBy(col("source"), col("batch"))
      .agg(sum(col("n")).as("n_tokens"), count(lit(1)).as("batch_vocab"))
    val news = cells.groupBy(col("source"), col("term"))
      .agg(min(col("batch")).as("batch"))
      .groupBy(col("source"), col("batch"))
      .agg(count(lit(1)).as("n_new_terms"))
    val cum = Window.partitionBy(col("source")).orderBy(col("batch"))
      .rowsBetween(Window.unboundedPreceding, 0)
    perBatch.join(news, Seq("source", "batch"), "left")
      .withColumn("n_new_terms", coalesce(col("n_new_terms"), lit(0L)))
      .withColumn("cum_vocab", sum(col("n_new_terms")).over(cum))
      .select(col("source"), col("batch"), col("n_tokens"), col("batch_vocab"),
        col("n_new_terms"), col("cum_vocab"),
        (col("n_new_terms").cast("double") / col("n_tokens").cast("double"))
          .as("new_term_rate"))
  }

  /** TOKEN FREQUENCY-OF-FREQUENCIES SPECTRUM (the Good–Turing input table):
    * for k = 1..10, how many distinct terms occur exactly k times, plus one
    * 11+ tail bucket — the corpus-shape fingerprint that distinguishes
    * natural text (smoothly decaying spectrum) from templated or synthetic
    * feeds (spiky), and the sanity readout before any smoothing that needs
    * n_k. Exact counts all the way; each bucket's share of the vocabulary
    * is one division. Scale shape: one tokenize+aggregate to term counts,
    * one 11-group aggregate of THAT frame.
    */
  def frequencySpectrum(spark: SparkSession, sfDir: String): DataFrame = {
    val tc = Tables.documents(spark, sfDir)
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c_t"))
    val v = tc.agg(count(lit(1)).as("vocab"))
    tc.select(least(col("c_t"), lit(11L)).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_terms"))
      .crossJoin(broadcast(v))
      .select(col("k"), col("n_terms"), col("vocab"),
        (col("n_terms").cast("double") / col("vocab").cast("double"))
          .as("vocab_share"))
  }

  /** SOURCE-VOCABULARY JACCARD MATRIX — exact J(A,B) = |A∩B|/|A∪B| over
    * each pair of sources' term SETS: the feed-level near-copy detector at
    * VOCABULARY grain (two mirrors share a vocabulary even when q278's
    * document-level near-dup rate is low because articles differ), read
    * with q295's KL — Jaccard says "same words", KL says "same
    * frequencies". Exact integers until one division per pair: the
    * (source, term) presence set is one distinct aggregate, |A∩B| one
    * term-keyed self-join count, sizes broadcast. Scale shape: the join
    * fans each term to its ≤|sources| holders — output and intermediate
    * are |sources|²-bounded per term, never corpus².
    */
  def sourceVocabJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val st = Tables.documents(spark, sfDir)
      .select(col("source"), explode(tokens(col("text"))).as("term"))
      .distinct()
    val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("v"))
    st.as("a").join(st.as("b"),
        col("a.term") === col("b.term") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sizes.select(col("source").as("src_a"), col("v").as("v_a"))),
        "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"), col("v").as("v_b"))),
        "src_b")
      .select(col("src_a"), col("src_b"), col("v_a"), col("v_b"), col("n_common"),
        (col("n_common").cast("double") /
          (col("v_a") + col("v_b") - col("n_common")).cast("double")).as("jaccard"))
  }

  /** HEAPS' LAW FIT (Heaps 1978, public) — vocabulary growth V(N) ≈ K·N^β
    * over the corpus in doc_id order, the scaling diagnostic a curation
    * pipeline reads before sizing tokenizers and dedup budgets (β ≈ 0.5
    * natural text; β near 1 flags boilerplate/noise that never saturates).
    * DISTRIBUTED SHAPE: docs deal into `nBuckets` prefix buckets by a pure
    * function of doc_id (value grid over the broadcast max — ids are
    * dense, no sort); cumulative tokens = prefix-sum of per-bucket token
    * counts and cumulative vocab = prefix-sum of per-bucket NEW-term
    * counts (each term attributed to its min bucket — one groupBy(term)
    * aggregate, the corpus' only heavy job); both windows ride the
    * |buckets|-row frame. The log-log OLS slope is the q187 recipe: ln
    * bridged to 12 decimals, moment folds quantized at (28,14), slope and
    * intercept fixed trees. Output: one row per bucket with the fit
    * repeated (the q243 convention).
    */
  def heapsFit(spark: SparkSession, sfDir: String, nBuckets: Int = 32): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    // the max id is a bounded ONE-VALUE probe (exact — the boundary-probe
    // class), so the bucket divisor is a folded constant: DIV, not
    // Column./ (double division — the q260 lesson), and a constant
    // divisor sidesteps an ANSI-mode DIVIDE_BY_ZERO thrown from the
    // subexpression-eliminated column form inside the final self-join
    val mxVal = docs.agg(max(col("doc_id"))).head().getLong(0)
    val bucketed = docs
      .withColumn("bucket", expr(s"doc_id * $nBuckets DIV ${mxVal + 1L}"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val perBucket = bucketed
      .select(col("bucket"), size(col("toks")).cast("long").as("ntok"))
      .groupBy(col("bucket")).agg(sum(col("ntok")).as("btok"))
    val newTerms = bucketed
      .select(col("bucket"), explode(col("toks")).as("term"))
      .groupBy(col("term")).agg(min(col("bucket")).as("fb"))
      .groupBy(col("fb")).agg(count(lit(1)).as("nnew"))
      .withColumnRenamed("fb", "bucket")
    // LEFT join + coalesce: a bucket introducing NO new term (a saturated
    // vocabulary — the synthetic corpus saturates in bucket 0) must still
    // carry the cumulative forward, or the curve collapses to one point
    val joined = perBucket.join(newTerms, Seq("bucket"), "left")
      .withColumn("nnew", coalesce(col("nnew"), lit(0L)))
      .select(col("bucket"), sum(col("btok")).over(w).as("cum_tokens"),
        sum(col("nnew")).over(w).as("cum_vocab"))
    def lnB(c: Column): Column =
      graft.core.Num.decToDouble(log(c).cast(org.apache.spark.sql.types.DecimalType(18, 12)))
    val pts = joined
      .filter(col("cum_tokens") > 0 && col("cum_vocab") > 0)
      .select(col("bucket"), col("cum_tokens"), col("cum_vocab"),
        lnB(col("cum_tokens").cast("double")).as("x"),
        lnB(col("cum_vocab").cast("double")).as("y"))
    def s(c: Column) = graft.core.Num.decToDouble(sum(c.cast(org.apache.spark.sql.types.DecimalType(28, 14))))
    val fit = pts.agg(count(lit(1)).as("n_points"),
      s(col("x")).as("sx"), s(col("y")).as("sy"),
      s(col("x") * col("y")).as("sxy"), s(col("x") * col("x")).as("sxx"))
    val nP = col("n_points").cast("double")
    val beta = (nP * col("sxy") - col("sx") * col("sy")) /
      (nP * col("sxx") - col("sx") * col("sx"))
    val lnK = (col("sy") - beta * col("sx")) / nP
    pts.crossJoin(broadcast(fit.select(beta.as("beta"), lnK.as("ln_k"),
        col("n_points"))))
      .select(col("bucket"), col("cum_tokens"), col("cum_vocab"),
        col("n_points"), col("beta"), col("ln_k"))
  }
}
