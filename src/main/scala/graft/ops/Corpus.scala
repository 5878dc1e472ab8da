package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Corpus curation: the composition the individual LLM-pipeline operators
  * exist for — produce the training-ready document manifest by chaining
  * exact-dedup survivorship, length bounds, and quality scoring in ONE pass.
  *
  * Shuffle budget: a single exchange, on the content fingerprint (for the
  * survivor window). Quality metrics are per-row expressions computed before
  * the shuffle and carried through; no second join against a dedup table —
  * the window formulation keeps the whole filter at one shuffle where the
  * naive survivors-join costs an aggregate plus a join.
  */
object Corpus {

  /** PER-DOCUMENT TOKEN CENSUS, memoized once per (session, scale factor) —
    * the r16 verdict's `doc_tokens` artifact: (doc_id, source, lang,
    * n_alpha_toks, n_ws_toks), i.e. both token standards the engine uses
    * (the `[a-z0-9]+` word count that the dedup/decontamination tier sums,
    * and the whitespace count the mix tier budgets). The projection was
    * being recomputed at ~19 call sites — every consumer paid a full corpus
    * scan + regexp for five narrow values; the two-consumer rule ("two
    * oracle-gated consumers of one expensive frame ⇒ one memo") applies one
    * level down from the LSH/census memos. In a deployment this is the
    * materialize-the-derived-table-once step (a ~40-byte row per document —
    * at 100 TB of text, a few TB of checkpoint, linear and co-partitioned
    * with every doc_id join that follows); in-JVM the shared registry gives
    * the same pay-once semantics with cache_paid/cache_hit attribution.
    * Token counts are exact longs of deterministic regexp counts, so every
    * consumer's gated hash is unchanged by construction.
    */
  def docTokens(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.cached(docTokensCache, "doc_tokens", spark, sfDir)(
      // scan-parallelism floor (r19, Tables.spreadScan scaladoc): two regexp
      // tokenizations per document pipelined into the 1-partition test scan
      Tables.spreadScan(Tables.documents(spark, sfDir), col("doc_id")).select(
        col("doc_id"), col("source"), col("lang"),
        size(TextAnalysis.alphaTokens(col("text"))).cast("long").as("n_alpha_toks"),
        TextAnalysis.qualityTokens.cast("long").as("n_ws_toks")))

  private val docTokensCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Training-set manifest: exact-dedup survivors (lowest doc_id per content
    * fingerprint) within length bounds above a quality floor.
    */
  def trainingFilter(spark: SparkSession, sfDir: String,
      minChars: Int = 50, maxChars: Int = 100000,
      minQuality: Double = 0.05): DataFrame = {
    val byFingerprint = Window
      .partitionBy(md5(TextAnalysis.normText(col("text"))))
      .orderBy(col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        TextAnalysis.qualityTokens.cast("long").as("n_tokens"),
        TextAnalysis.qualityScore.as("quality_score"),
        row_number().over(byFingerprint).as("rn"))
      .filter(col("rn") === 1 &&
        col("n_chars").between(minChars, maxChars) &&
        col("quality_score") >= minQuality)
      .drop("rn")
  }

  /** Deterministic 0..999 hash bucket of a document id under a salt. Content-
    * addressed (md5 of "id:salt"), so the assignment is a pure function of the
    * row — stable across runs, engines, partitionings, and data order, which
    * is what makes splits/samples reproducible on a cluster. Per-row, no
    * shuffle, codegen'd.
    */
  private[graft] def hashBucket(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long") % 1000

  /** INVERSE-FREQUENCY CLASS WEIGHTS for the language label — w_c =
    * N/(k·n_c), the standard imbalanced-training reweighting table (a
    * balanced corpus gets every w = 1; a rare class is up-weighted by its
    * scarcity) emitted as the artifact a trainer joins per-example. Every
    * count exact; the weight is one fixed tree over N, k, n_c. ONE
    * scan-speed aggregate; the k-row weights frame broadcasts back to
    * training joins for free.
    */
  def classWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.documents(spark, sfDir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val tot = counts.agg(sum(col("n_docs")).as("n_total"),
      count(lit(1)).as("k_classes"))
    counts.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"), col("n_total"), col("k_classes"),
        (col("n_docs").cast("double") / col("n_total").cast("double"))
          .as("share"),
        (col("n_total").cast("double") /
          (col("k_classes") * col("n_docs")).cast("double")).as("weight"))
  }

  /** DETERMINISTIC NEGATIVE SAMPLING for recommender / contrastive
    * training data: k content-addressed candidate items per customer
    * (md5(custkey:draw:salt) mod |parts| — partkeys are contiguous
    * 0..P−1), with the customer's true purchases anti-joined away. The
    * SCALE-CORRECT spelling of "sample items the user did NOT buy": no
    * rand() (re-runs and retried tasks produce identical rows), no
    * per-user collected item sets — one generated frame and one
    * co-keyed LEFT ANTI join. Collisions with positives DROP rather than
    * redraw (the emitted count per user is ≤ k; the share lost is the
    * user's positive rate, which the output makes visible) — redraw loops
    * are sequential and have no bounded-step distributed form. |parts|
    * rides a broadcast one-row aggregate.
    */
  def negativeSamples(spark: SparkSession, sfDir: String, k: Int = 8,
      salt: String = "neg_v1"): DataFrame = {
    val pos = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_partkey").as("item")),
        "o_orderkey")
      .select(col("o_custkey").as("user_id"), col("item"))
      .distinct()
    val nParts = Tables.part(spark, sfDir).agg(count(lit(1)).as("n_parts"))
    val draws = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"))
      .crossJoin(broadcast(nParts))
      .crossJoin(broadcast(spark.range(0, k.toLong).select(col("id").as("draw"))))
      .select(col("user_id"), col("draw"),
        (conv(substring(md5(concat(col("user_id").cast("string"), lit(":"),
          col("draw").cast("string"), lit(":" + salt))), 1, 8), 16, 10)
          .cast("long") % col("n_parts")).as("item"))
    draws.join(pos, Seq("user_id", "item"), "left_anti")
  }

  /** Train/valid/test split by deterministic hash bucket (900/50/50 ‰).
    * The classic leakage-safe corpus split: membership depends only on
    * doc_id + salt, so re-running over a grown corpus never moves an old
    * document between splits.
    */
  def hashSplit(spark: SparkSession, sfDir: String, salt: String = "split_v1"): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), hashBucket(col("doc_id"), salt).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 900, "train")
          .when(col("bucket") < 950, "valid")
          .otherwise("test"))

  /** The (shard, shuffle_key) pair shared by [[shuffleShards]] and
    * [[sequencePack]] — one derivation, so packs always align with shards.
    */
  private def shardCol(salt: String, nShards: Int): Column =
    hashBucket(col("doc_id"), salt) % nShards
  private def shuffleKeyCol(salt: String): Column =
    md5(concat(col("doc_id").cast("string"), lit("#" + salt)))

  /** Deterministic corpus shuffle, sharded: documents are dealt into
    * `nShards` pseudo-random shards by content-addressed hash and ordered
    * within each shard by a second hash. This is the scale-correct way to
    * "shuffle" a 100 TB corpus for training: a global `ORDER BY random()`
    * needs a total order (range exchange + global row numbering); sharding
    * needs one hash partition per shard and a partition-local sort, and each
    * shard is an independently writable training file. The within-shard
    * position is a window partitioned BY SHARD — parallel, never a
    * single-task global window.
    */
  def shuffleShards(spark: SparkSession, sfDir: String, nShards: Int = 8,
      salt: String = "shuffle_v1"): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), shardCol(salt, nShards).as("shard"),
        shuffleKeyCol(salt).as("shuffle_key"))
      .withColumn("pos_in_shard",
        row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("shuffle_key"), col("doc_id")))
          .cast("long"))

  /** Fixed-width character chunking with overlap — context-window packing's
    * first half: every document becomes ⌈n/stride⌉ windows of `width` chars
    * starting every `stride` chars. One generate-and-explode per document,
    * no shuffle; only (doc_id, offsets, md5) leave the scan, never chunk
    * text.
    */
  def docChunks(spark: SparkSession, sfDir: String,
      width: Int = 256, stride: Int = 224): DataFrame =
    docChunksFrom(Tables.documents(spark, sfDir), width, stride)

  /** Same over any (doc_id, text) frame — separated for edge-case tests. */
  private[graft] def docChunksFrom(docs: DataFrame, width: Int, stride: Int): DataFrame = {
    val t = col("text")
    docs
      .select(col("doc_id"),
        explode(sequence(lit(1), greatest(length(t), lit(1)), lit(stride))).as("start"),
        t.as("t"))
      .select(col("doc_id"),
        ((col("start") - 1) / stride).cast("long").as("chunk_idx"),
        col("start").cast("long").as("start"),
        length(col("t").substr(col("start"), lit(width))).cast("long").as("chunk_len"),
        md5(col("t").substr(col("start"), lit(width))).as("chunk_md5"))
  }

  // Redaction patterns: RE2-compatible (no backrefs/lookaround), so the same
  // pattern strings run identically in Spark (java.util.regex) and DuckDB (RE2).
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val LongNumRe = "[0-9]{6,}"

  /** PII/URL scrubbing: emails, URLs, then long digit runs are replaced by
    * typed placeholder tags, in that fixed order (emails and URLs may contain
    * digit runs — applying the most specific pattern first makes the
    * composition deterministic). Per-row regex work, zero shuffle; emits
    * counts + the redacted text's md5/length, never the text.
    */
  def piiRedact(spark: SparkSession, sfDir: String): DataFrame = {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          UrlRe, "<URL>"),
        LongNumRe, "<NUM>")
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(UrlRe), lit(0))).cast("long").as("n_urls"),
      size(regexp_extract_all(col("text"), lit(LongNumRe), lit(0))).cast("long").as("n_longnums"),
      length(redacted).cast("long").as("redacted_len"),
      md5(redacted).as("redacted_md5"))
  }

  /** Deterministic sequence packing: documents are dealt into shards
    * ([[shuffleShards]]' scheme), ordered pseudo-randomly within each shard,
    * and assigned to fixed token-budget packs by exclusive running token
    * count — pack k holds the docs whose preceding in-shard tokens total
    * [k·budget, (k+1)·budget). This is streaming-order packing (each pack
    * fills to the budget with at most one doc of spillover), not bin-packing
    * — but it is a pure function of the corpus, reproducible on any cluster,
    * and each shard's window is parallel. The running sum is the only state,
    * so the same pass works incrementally as new documents arrive.
    */
  def sequencePack(spark: SparkSession, sfDir: String, nShards: Int = 8,
      tokenBudget: Int = 4096, salt: String = "shuffle_v1"): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("shuffle_key"), col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        shardCol(salt, nShards).as("shard"),
        shuffleKeyCol(salt).as("shuffle_key"),
        TextAnalysis.qualityTokens.cast("long").as("n_tokens"))
      .withColumn("tokens_before",
        coalesce(sum(col("n_tokens")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("pack_id", floor(col("tokens_before") / tokenBudget).cast("long"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        col("tokens_before"), col("pack_id"))
  }

  /** The final training manifest: exact-dedup survivors within length/quality
    * bounds ([[trainingFilter]]) that are ALSO their near-dup family's
    * representative ([[Graph.dupClusters]]) — the composition every stage in
    * the dedup suite exists to feed. One semi join on doc_id; the CC label
    * table carries two longs per doc.
    */
  def dedupedCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val reps = Graph.dupClusters(spark, sfDir)
      .filter(col("is_representative"))
      .select(col("doc_id"))
    trainingFilter(spark, sfDir)
      .join(reps, Seq("doc_id"), "left_semi")
  }

  /** The COMPLETE curation pipeline composed into one materialized corpus
    * build — the LLM-data analogue of the sales pipeline's q33: quality/
    * length filter ∧ exact-dup survivor ([[trainingFilter]]) ∧ near-dup
    * family representative ([[Graph.dupClusters]] over the verified LSH
    * edges) ∧ decontaminated against the eval slice
    * ([[Curation.decontaminate]]). A user's "build my training corpus" is
    * this one call.
    *
    * Scale shape: every stage is the already-audited operator — the
    * expensive verified-edge and cluster-label tables are the memoized
    * materialize-once artifacts shared with q17/q55/q67/q81, and the final
    * intersections are two semi joins on doc_id (narrow keys; no text).
    */
  def curatedCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val clean = Curation.decontaminate(spark, sfDir)
      .filter(!col("is_contaminated")).select(col("doc_id"))
    dedupedCorpus(spark, sfDir)
      .join(clean, Seq("doc_id"), "left_semi")
  }

  /** QUALITY→TOKEN BUDGET CURVE — the curation-planning readout that turns
    * "train on the best X% " into a token number: documents rank by
    * (quality_score DESC, doc_id) through the two-phase global rank (no
    * single-task sort), deal into 10 floor-distribution rank tiles (the
    * q206 convention — a pure function of the rank, never ntile()'s
    * remainder-splitting), and each tile reports its documents, exact
    * tokens, cumulative tokens and cumulative token share. Reading the
    * curve top-down answers "where do I cut quality to hit a token
    * budget" — cumulative share at tile k IS the budget fraction a
    * keep-top-k policy buys. Scale shape: one scan-speed score+tokenize
    * projection, the q184 rank machinery, a 10-group aggregate and a
    * 10-row window.
    */
  def qualityBudgetCurve(spark: SparkSession, sfDir: String,
      nTiles: Int = 10): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextAnalysis.qualityScore.as("q"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .cast("long").as("n_toks"))
    val n = docs.agg(count(lit(1)).as("n"), sum(col("n_toks")).as("total_toks"))
    val tiled = graft.ops.Relational
      .twoPhaseRank(docs, "q", "doc_id", "rk", descending = true)
      .crossJoin(broadcast(n))
      .withColumn("tile", expr(s"((rk - 1) * $nTiles) DIV n") + 1)
    val byTile = tiled.groupBy(col("tile"), col("total_toks"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("tile_tokens"))
    val cum = org.apache.spark.sql.expressions.Window.orderBy(col("tile"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    byTile
      .withColumn("cum_tokens", sum(col("tile_tokens")).over(cum))
      .select(col("tile"), col("n_docs"), col("tile_tokens"), col("cum_tokens"),
        (col("cum_tokens").cast("double") / col("total_toks").cast("double"))
          .as("cum_token_share"))
  }

  /** Content-addressed corpus diff — the incremental-refresh primitive: given
    * two corpus versions, classify every document as added / removed /
    * changed / unchanged by comparing content hashes, so a 100 TB refresh
    * reprocesses only the changed slice instead of the whole corpus. The
    * whole operator is one equi-join of (doc_id, md5) pairs — text never
    * shuffles, and the join carries two hashes per document.
    *
    * The oracle-gated instantiation derives both versions deterministically
    * from the one corpus: "old" drops every 7th document, "new" drops
    * doc_id ≡ 3 (mod 11) and appends a suffix to every 5th document's text
    * (suffixing, not case mapping: Java and utf8proc upper-case special
    * characters differently, which would diverge the hashes on non-ASCII
    * corpora) — so all four statuses occur.
    *
    * Presence is carried as an explicit flag per side — a document whose
    * text is NULL still EXISTS in its version, so status must branch on
    * join-side presence, never on hash nullity, and the hash comparison is
    * null-safe.
    */
  def corpusDiff(spark: SparkSession, sfDir: String): DataFrame = {
    // versions shared with [[Refresh]] — the diff and its refresh consumer
    // (q101) must classify against the SAME derived corpora
    val prev = Refresh.docsV1(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("old_md5"), lit(true).as("in_old"))
    val next = Refresh.docsV2(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("new_md5"), lit(true).as("in_new"))
    prev.join(next, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("in_old").isNull, "added")
          .when(col("in_new").isNull, "removed")
          .when(!(col("old_md5") <=> col("new_md5")), "changed")
          .otherwise("unchanged"))
      .select(col("doc_id"), col("status"))
  }

  /** Quality-proportional deterministic sampling: each document survives with
    * probability min(1, gain·quality) — realized as `bucket <
    * floor(quality·1000·gain)` over the content-addressed 0..999 bucket, so
    * higher-quality documents are kept proportionally more often (the
    * DCLM/FineWeb-style quality-weighted downsampling) while membership stays
    * a pure function of (doc_id, salt): reproducible across runs, engines,
    * and partitionings. Per-row filter, no shuffle, no rand().
    */
  def qualitySample(spark: SparkSession, sfDir: String, gain: Double = 3.0,
      salt: String = "qsample_v1"): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        TextAnalysis.qualityScore.as("quality_score"),
        hashBucket(col("doc_id"), salt).as("bucket"))
      .filter(col("bucket") <
        least(lit(1000L), floor(col("quality_score") * lit(1000.0 * gain))))

  /** Source-mix allocation ("data mixing"): cap every source at a fixed token
    * budget by taking documents in content-addressed shuffle order until the
    * budget fills — the rebalancing step that stops one over-represented
    * source from dominating an epoch.
    *
    * Scale shape: the budget is split evenly across `nShards` hash shards and
    * the running token sum is computed per (source, shard) — `nShards`
    * independent bounded windows instead of ONE giant per-source prefix sum
    * whose single sorted partition would be the straggler at 100 TB. Each
    * shard admits documents while its share of the budget lasts, so the
    * global take is within one document per shard of the exact greedy fill,
    * deterministic, and embarrassingly parallel.
    */
  def sourceMix(spark: SparkSession, sfDir: String, tokenBudget: Long = 24000,
      nShards: Int = 8, salt: String = "mix_v1"): DataFrame = {
    val w = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("mix_key"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        TextAnalysis.qualityTokens.cast("long").as("n_tokens"),
        (hashBucket(col("doc_id"), salt) % nShards).as("shard"),
        md5(concat(col("doc_id").cast("string"), lit("#" + salt))).as("mix_key"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= tokenBudget / nShards)
  }

  /** Stratified deterministic sampling: per-language keep-rates (‰), applied
    * through the content-addressed bucket — the standard way to rebalance a
    * multilingual corpus (downsample the dominant language) while staying
    * reproducible. A pure per-row filter: no shuffle, no `rand()` (whose
    * sample changes with partitioning), fully pushdown-able.
    */
  def stratifiedSample(spark: SparkSession, sfDir: String,
      salt: String = "sample_v1"): DataFrame = {
    val rate = when(col("lang") === "en", 500)
      .when(col("lang") === "de", 300)
      .otherwise(100)
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        hashBucket(col("doc_id"), salt).as("bucket"), rate.as("keep_permille"))
      .filter(col("bucket") < col("keep_permille"))
  }

  /** Exact class balancing: every language downsampled to the MINORITY
    * language's document count, membership decided by a content-addressed
    * rank (md5 of "id#salt") so the kept set is a pure function of the
    * corpus — [[stratifiedSample]]'s fixed per-class rates replaced by a
    * data-driven equal-size target (the classifier-training prep where class
    * priors must not leak into the model). Two shuffles, both on `lang`
    * (|langs| groups): the count aggregate and the per-class rank window;
    * the minority count rides as a broadcast one-row frame. At 100 TB the
    * per-class window sorts only (doc_id, rank_key) pairs — text never
    * shuffles — and a skewed dominant class salts the sort via the hash key's
    * uniformity (range partition on rank_key splits it evenly by
    * construction).
    */
  def classBalance(spark: SparkSession, sfDir: String,
      salt: String = "balance_v1"): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        md5(concat(col("doc_id").cast("string"), lit("#" + salt))).as("rank_key"))
    val minority = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("target"))
    docs
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("rank_key"), col("doc_id")))
        .cast("long"))
      .crossJoin(broadcast(minority))
      .filter(col("rn") <= col("target"))
      .select(col("doc_id"), col("lang"), col("rn"), col("target"))
  }

  /** Weighted sampling without replacement, Efraimidis–Spirakis: each
    * document draws a deterministic uniform u from its content hash and is
    * ranked by ln(u)/w (the A-ES key, order-isomorphic to u^(1/w)); the
    * top-k ranked rows ARE a weighted sample without replacement — here
    * weighted by document length, the "sample long documents
    * proportionally more" curation draw. Cross-engine determinism: u is one
    * division of a 32-bit hash prefix, ln goes through the 12-decimal
    * bridge ([[graft.core.Num.decToDouble]] — JVM log vs libm differ in the
    * last ulp), and the key is one further division; ties break by doc_id.
    * Scale shape: the rank is a global top-k over (doc_id, key) pairs only —
    * Spark's sort-limit pushes the limit into each partition before the
    * single-task merge, so the full sort never happens and text never moves.
    */
  /** The Efraimidis–Spirakis key ln(u)/w with the deterministic md5-uniform
    * u = (h+1)/(2³²+1) and the 12-decimal ln bridge — factored so the global
    * (q168) and stratified (q240) samplers derive the IDENTICAL key.
    */
  private def esKey(salt: String): Column = {
    import org.apache.spark.sql.types.DecimalType
    val h = conv(substring(md5(concat(col("doc_id").cast("string"),
      lit(":" + salt))), 1, 8), 16, 10).cast("long")
    val u = (h + lit(1L)).cast("double") / lit(4294967297.0) // (h+1)/(2^32+1) ∈ (0,1)
    graft.core.Num.decToDouble(log(u).cast(DecimalType(18, 12))) /
      col("n_chars").cast("double")
  }

  def weightedSample(spark: SparkSession, sfDir: String, k: Int = 200,
      salt: String = "wsample_v1"): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"), esKey(salt).as("es_key"))
      .orderBy(col("es_key").desc, col("doc_id"))
      .limit(k)

  /** STRATIFIED weighted sampling — [[weightedSample]]'s A-ES draw run
    * independently per language: top-k es_keys WITHIN each stratum, so every
    * language keeps k representatives (chars-weighted, deterministic,
    * engine-independent) regardless of how skewed the language mix is — the
    * per-slice eval-set draw a curation pipeline makes where a global sample
    * would be swamped by the dominant language. The per-stratum selection
    * runs on the NATIVE [[graft.plans.TopKPerGroup]] physical operator
    * (per-partition bounded heaps + final per-group heap — never a full
    * per-stratum sort, never more than |strata|·k rows past the partial
    * stage), with doc_id as the total-order tiebreak. A stratum with fewer
    * than k documents keeps them all, exactly as the oracle's row_number
    * filter defines.
    */
  def stratifiedWeightedSample(spark: SparkSession, sfDir: String, k: Int = 50,
      salt: String = "strat_v1"): DataFrame = {
    val keyed = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"), esKey(salt).as("es_key"))
    graft.plans.TopKPerGroup.topK(keyed, Seq("lang"),
      Seq(("es_key", true), ("doc_id", false)), k)
  }

  /** PERCENTILE NORMALIZATION of a document feature per language — the
    * rank-based feature transform (quantile normalization) a curriculum or
    * length-balancing step applies before mixing slices whose raw scales
    * differ: each document's length maps to its within-language percentile,
    * so 'long for German' and 'long for English' become comparable. The
    * percentile is `percent_rank` over a TOTALIZED order (doc_id breaks
    * length ties), i.e. pure rank arithmetic (rank−1)/(n−1) — one exact
    * integer ratio per row, cross-engine deterministic with no bridging.
    *
    * Scale shape: q184's TWO-PHASE RANK run per language
    * ([[graft.ops.Relational.twoPhaseRankBy]]): buckets cut on a broadcast
    * per-language (min,max) length range, offsets prefix-summed per
    * language, every sort (lang, bucket)-local over bare (n_chars, doc_id)
    * pairs — so a corpus dominated by ONE language (80%+ of real web text)
    * still spreads that language over its 64 buckets instead of
    * concentrating it in a single window task, and text never enters any
    * sort. The rank is then pure arithmetic: pct = (rank−1)/(n_lang−1),
    * the same integer ratio `percent_rank` computes (order totalized by
    * doc_id ⇒ rank = row_number), cross-engine exact; a one-document
    * language pins pct = 0 exactly as both engines define it.
    */
  def percentileNormalize(spark: SparkSession, sfDir: String): DataFrame = {
    // A NULL lang is its own partition — exactly as `percent_rank() OVER
    // (PARTITION BY lang ...)` (and the q199 oracle) define it. The rank
    // machinery attaches buckets/offsets/counts through EQUI-joins, which
    // silently DROP null keys, so lang rides through a non-null surrogate
    // ("\u0000" collides with no real language tag) and the original
    // column is re-selected for output.
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("__langk", coalesce(col("lang"), lit("\u0000")))
    val ns = docs.groupBy(col("__langk")).agg(count(lit(1)).as("__n"))
    graft.ops.Relational.twoPhaseRankBy(docs, Seq("__langk"), "n_chars", "doc_id", "__rk")
      .join(broadcast(ns), Seq("__langk"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        when(col("__n") === 1, lit(0.0))
          .otherwise((col("__rk") - 1).cast("double") / (col("__n") - 1).cast("double"))
          .as("pct"))
  }

  /** T5-STYLE SPAN CORRUPTION (Raffel et al. 2020, public): tokens group
    * into aligned `spanLen`-token spans, a DETERMINISTIC md5(doc:span)
    * draw masks ~1/`maskMod` of them, and each document emits the
    * corrupted input (masked spans replaced by per-span sentinels
    * `<X_s>`) plus the target sequence (each sentinel followed by the
    * span it hides) — the denoising pre-training pair, reproducible
    * across engines, executors and reruns with no stored RNG state.
    * Sentinel ids are SPAN indices (not a running mask counter), which
    * keeps the rebuild a pure per-span map — order-independent until the
    * final per-doc ordered fold. Scale shape: one explode to
    * |tokens|/spanLen rows, two content-addressed hashes per span, one
    * per-doc ordered aggregate; text never joins anything.
    */
  def spanCorruption(spark: SparkSession, sfDir: String,
      spanLen: Int = 3, maskMod: Int = 5): DataFrame = {
    val toks = regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))
    val nSpans = ceil(size(col("toks")).cast("double") / spanLen).cast("int")
    val spans = Tables.documents(spark, sfDir)
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), nSpans - 1)).as("s"))
      .select(col("doc_id"), col("s").cast("long").as("s"),
        array_join(slice(col("toks"), col("s") * spanLen + 1, lit(spanLen)), " ").as("piece"),
        size(slice(col("toks"), col("s") * spanLen + 1, lit(spanLen))).cast("long").as("plen"))
      .withColumn("masked",
        conv(substring(md5(concat(col("doc_id"), lit(":"), col("s"))), 1, 8), 16, 10)
          .cast("long") % maskMod === 0)
    val sentinel = concat(lit("<X_"), col("s"), lit(">"))
    spans
      .withColumn("in_piece", when(col("masked"), sentinel).otherwise(col("piece")))
      .withColumn("tgt_piece",
        when(col("masked"), concat(sentinel, lit(" "), col("piece"))))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("plen")).as("n_tokens"),
        sum(when(col("masked"), col("plen")).otherwise(0L)).as("n_masked"),
        array_join(transform(array_sort(collect_list(struct(col("s"), col("in_piece")))),
          x => x.getField("in_piece")), " ").as("corrupted"),
        array_join(transform(array_sort(collect_list(
          when(col("tgt_piece").isNotNull, struct(col("s"), col("tgt_piece"))))),
          x => x.getField("tgt_piece")), " ").as("targets"))
  }
}
