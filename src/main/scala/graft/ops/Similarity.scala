package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Num, Tables}

/** Vector similarity search over the `embeddings` table (64-dim float vectors).
  *
  *  - [[cosineTopK]]: brute-force exact top-k — the correctness baseline. The
  *    query set is broadcast; the corpus is scanned once, fully parallel.
  *  - [[annBucketTopK]]: sign-LSH bucketed ANN — the 100 TB path. Vectors are
  *    bucketed by the sign pattern of their leading dimensions (a random-
  *    projection LSH with axis-aligned planes); search touches only the query's
  *    bucket, an equi-join on the bucket key instead of a cross join.
  *  - [[nearDupPairs]]: embedding-cosine near-duplicate detection, LSH-blocked.
  *
  * Numeric determinism: cosine math runs on integer-scaled vectors —
  * floor(x·10^8) per component, exact int64 dot products / norms — and converts
  * to double only for the final sqrt/division (IEEE-identical everywhere). This
  * keeps every stage oracle-checkable. (A double-precision fast path would be
  * ~2× quicker but loses cross-engine bit equality; at cluster scale the scan,
  * not the multiply, dominates.)
  */
object Similarity {

  private val Scale = 1e8

  /** Integer-scaled copy of a float vector: exact int64 components. */
  private def scaled(c: Column): Column =
    transform(c, x => floor(x * lit(Scale)).cast("long"))

  /** Exact int64 dot product of two scaled vectors. */
  private def idot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** cos(a,b) over scaled vectors — evaluated natively by
    * [[graft.functions.CosineSimExpr]] (one loop per pair). The norms are
    * recomputed inline from the exact integer vectors, which yields the
    * IDENTICAL double as the precomputed-norm formulation (same int64 values
    * into the same sqrt/division), so the `na2`/`nb2` arguments exist only to
    * keep call sites self-documenting; Catalyst prunes the unused columns.
    */
  private def cosine(a: Column, b: Column, na2: Column, nb2: Column): Column =
    graft.functions.CosineSimExpr(a, b)

  /** HOF formulation (zip_with + aggregate), the executable spec the native
    * expression is tested against.
    */
  private[graft] def cosineHof(a: Column, b: Column): Column =
    idot(a, b).cast("double") / (sqrt(idot(a, a).cast("double")) * sqrt(idot(b, b).cast("double")))

  /** Test access to the scaled-vector projection. */
  private[graft] def scaledVecs(spark: SparkSession, sfDir: String): DataFrame =
    withScaled(Tables.embeddings(spark, sfDir))

  private[graft] def withScaled(df: DataFrame): DataFrame =
    // scan-parallelism floor (r19, Tables.spreadScan scaladoc): the whole
    // vector tier's per-pair arithmetic (CosineSimExpr under a broadcast
    // probe join, k-means assignment, PQ encode) pipelines into THIS frame's
    // partitions, and the single-row-group embeddings scan gave it exactly
    // one — every brute-force cosine pass ran sequentially. No-op whenever
    // the source already has ≥ parallelism partitions (any cluster-scale
    // layout).
    Tables.spreadScan(df, col("vec_id")).select(
      col("vec_id"),
      scaled(col("embedding")).as("svec"))
      .withColumn("norm2", idot(col("svec"), col("svec")))

  /** Brute-force exact cosine top-k: for each query vector (vec_id < nQueries),
    * the k nearest corpus vectors. Query side is tiny → broadcast; corpus side
    * streams through one scan, then a per-query top-k window.
    */
  def cosineTopK(spark: SparkSession, sfDir: String, nQueries: Int = 20, k: Int = 5): DataFrame = {
    val vecs = withScaled(Tables.embeddings(spark, sfDir))
    val q = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("svec").as("qvec"), col("norm2").as("qnorm2"))
    val cos = cosine(col("qvec"), col("svec"), col("qnorm2"), col("norm2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    broadcast(q).join(vecs, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), cos.as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rk").cast("long").as("rk"), col("cosine"))
  }

  /** Exact cosine of EVERY corpus vector to one query vector — the
    * single-query flavor of [[cosineTopK]] (broadcast one row × one corpus
    * scan), exposed for the hybrid-search fusion in
    * [[TermStats.hybridSearch]]. Same integer-scaled arithmetic, so the
    * scores are cross-engine bit-exact and safe to RANK on.
    */
  private[graft] def cosineToQuery(spark: SparkSession, sfDir: String,
      queryId: Long): DataFrame = {
    val vecs = withScaled(Tables.embeddings(spark, sfDir))
    val q = vecs.filter(col("vec_id") === queryId)
      .select(col("svec").as("qvec"), col("norm2").as("qnorm2"))
    broadcast(q).join(vecs, col("vec_id") =!= queryId)
      .select(col("vec_id").as("doc_id"),
        cosine(col("qvec"), col("svec"), col("qnorm2"), col("norm2")).as("cosine"))
  }

  /** SEMANTIC DECONTAMINATION — the THIRD leak channel, after q75's exact
    * grams and q343's near-dup families: for every EVAL item (the q75 hash
    * slice, joined to its embedding), the nearest TRAINING document by
    * exact cosine, a semantic-match flag (cosine ≥ τ — the default is
    * calibrated to this corpus's synthetic embedding geometry, where
    * 64-dim near-uniform vectors concentrate NN cosines around ~0.36 and
    * ≥0.4 marks the planted-similarity tail; real text embedders sit far
    * higher and deploy with τ ≈ 0.9, the knob a caller owns), whether the
    * gram check already flags that neighbor, and the PARAPHRASE-LEAK verdict —
    * a semantic match whose neighbor the gram filter cleared, i.e. the
    * reworded benchmark content n-gram decontamination structurally cannot
    * see (the SemDeDup-style argument applied to eval integrity). Read
    * beside q348/q349: grams say how much verbatim text leaked; this says
    * what leaked in MEANING.
    *
    * Exactness: the cosine is the engine's integer-scaled machinery
    * (exact int64 dot products into one sqrt/division — bit-identical
    * cross-engine, the q25 contract), so the τ comparison is deterministic;
    * ties on cosine break to the lowest neighbor id. Scale shape: the eval
    * side broadcasts over one training-side scan + a per-eval top-1 window
    * — the gated exact arm; at corpus scale the same query rides the IVF
    * index (q36/q296 chain) with this arm as its recall oracle, the
    * documented ANN-tier convention.
    */
  def semanticDecontam(spark: SparkSession, sfDir: String,
      evalPermille: Int = 200, salt: String = "eval_v1",
      tau: Double = 0.4): DataFrame =
    if (evalPermille == 200 && salt == "eval_v1" && tau == 0.4)
      // default-args audit memoized once per (session, scale): q354, q356's
      // exact arm, q357's feed rollup and q351's card arm all pay the
      // |eval|×|train| NN scan otherwise (the two-consumer rule; non-default
      // calls compute directly — the passage_flags aliasing rule). Cost
      // cliff (r17 ADVICE): a caller tuning ANY parameter — τ included, even
      // though τ only gates a comparison on the already-scored cosines —
      // forfeits the memo and re-pays the full NN scan per call; sweep τ
      // over [[semanticDecontam]]'s default output instead of re-calling.
      Dedup.cached(semanticFlagsCache, "semantic_flags", spark, sfDir)(
        semanticDecontamCompute(spark, sfDir, 200, "eval_v1", 0.4))
    else semanticDecontamCompute(spark, sfDir, evalPermille, salt, tau)

  private val semanticFlagsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private[ops] def semanticDecontamCompute(spark: SparkSession, sfDir: String,
      evalPermille: Int, salt: String, tau: Double): DataFrame = {
    val isEval = Corpus.hashBucket(col("vec_id"), salt) < evalPermille
    val vecs = Tables.embeddings(spark, sfDir)
    semanticFlagsFromNN(spark, sfDir,
      semanticNnAgainst(vecs.filter(!isEval), vecs.filter(isEval)), tau)
  }

  /** SEMANTIC DECONTAMINATION AGAINST AN EXTERNAL EVAL RELATION — the
    * embedding channel's [[Curation.decontaminateAgainst]] (r17 verdict item
    * 2): `evalVecs` is anything with (vec_id, embedding) — a REAL benchmark
    * suite's embedded items, or [[semanticDecontam]]'s hash slice — and every
    * eval item gets its nearest `trainVecs` neighbor by exact integer-scaled
    * cosine plus the τ-match verdict. The operator never sees how the suite
    * was selected (the q83 contract); the gram-flag / paraphrase-leak
    * columns of the internal form need the CORPUS's gram verdicts and stay
    * on [[semanticDecontam]], whose hash-slice form is re-expressed through
    * this core (the identity the spec pins).
    *
    * Scale shape: the eval side broadcasts (a benchmark suite is suite-sized
    * — kilobytes of scaled vectors against a 100 TB crawl) over ONE
    * training-side scan + a per-item top-1 window; ties on cosine break to
    * the lowest neighbor id. At corpus scale the IVF arm (q356) is the
    * deployment path with this exact arm as its recall oracle.
    */
  def semanticDecontamAgainst(trainVecs: DataFrame, evalVecs: DataFrame,
      tau: Double = 0.4): DataFrame =
    semanticNnAgainst(trainVecs, evalVecs)
      .withColumn("is_semantic_match", col("cosine") >= tau)

  /** The NN-scoring core over arbitrary (vec_id, embedding) relations —
    * scaling, broadcast, cosine and the top-1 tie-break in ONE place, shared
    * by the internal hash-slice audit (q354) and the external-suite form
    * (q365), so the two can never diverge.
    */
  private[ops] def semanticNnAgainst(trainVecs: DataFrame,
      evalVecs: DataFrame): DataFrame = {
    val t = withScaled(trainVecs.select(col("vec_id"), col("embedding")))
    val q = withScaled(evalVecs.select(col("vec_id"), col("embedding")))
      .select(col("vec_id").as("eval_id"), col("svec").as("qvec"),
        col("norm2").as("qnorm2"))
    val w = Window.partitionBy(col("eval_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    broadcast(q).join(t)
      .select(col("eval_id"),	col("vec_id"),
        cosine(col("qvec"), col("svec"), col("qnorm2"), col("norm2")).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("eval_id").as("doc_id"), col("vec_id").as("nn_train_id"),
        col("cosine"))
  }

  /** The oracle-gated instantiation of [[semanticDecontamAgainst]] (the
    * decontaminateExternal convention, embedding channel): the "external
    * suite" is the 50‰ hash slice of the embeddings under an independent
    * salt — small like a real benchmark, expressible in ANSI SQL for the
    * gate — and the code path exercised is exactly the external-relation
    * one (the operator never sees how the suite was selected).
    */
  def semanticDecontamExternal(spark: SparkSession, sfDir: String,
      suitePermille: Int = 50, salt: String = "suite_v2",
      tau: Double = 0.4): DataFrame = {
    val inSuite = Corpus.hashBucket(col("vec_id"), salt) < suitePermille
    val vecs = Tables.embeddings(spark, sfDir)
    semanticDecontamAgainst(vecs.filter(!inSuite), vecs.filter(inSuite), tau)
  }

  /** The q354 FINISHER, shared verbatim with the streaming monitor
    * ([[graft.streaming.ScoreStream.semanticDecontamAvailableNow]], q355):
    * given the per-eval nearest-training-neighbor frame (doc_id,
    * nn_train_id, cosine), join the gram verdicts (the memoized q75
    * artifact) and emit the τ-match / gram-flag / paraphrase-leak columns.
    * Living in ONE place is what makes the batch/stream hash-parity an
    * identity rather than a coincidence.
    */
  private[graft] def semanticFlagsFromNN(spark: SparkSession, sfDir: String,
      nn: DataFrame, tau: Double): DataFrame = {
    val verd = Curation.decontaminate(spark, sfDir)
      .select(col("doc_id").as("nn_train_id"),
        col("is_contaminated").as("nn_gram_flagged"))
    nn.join(verd, "nn_train_id")
      .select(col("doc_id"), col("nn_train_id"), col("cosine"),
        (col("cosine") >= tau).as("is_semantic_match"),
        col("nn_gram_flagged"),
        (col("cosine") >= tau && !col("nn_gram_flagged")).as("paraphrase_leak"))
  }

  /** SEMANTIC DECONTAMINATION, IVF ARM — q354's audit on the index a 100 TB
    * deployment would actually run: eval items search only their own IVF
    * cell (the q36 inverted-file shape — candidates drop from |corpus| to
    * ~|corpus|/nCentroids per item), and every approximate verdict is laid
    * beside the exact arm's: the per-item nearest neighbor both ways,
    * whether the index RECALLED the true neighbor, and whether the cheap
    * verdict AGREES with the exact one — the tuning instrument that decides
    * if nprobe=1 is safe for release gating or the audit must pay for
    * probes (the q296/q320 ANN-tier convention, applied to the newest
    * channel). An eval item whose cell holds no training vector keeps its
    * row with NULL ivf columns and nn_recalled=false (the q315
    * empty-stratum lesson — the left join is from the exact arm's spine, so
    * the audit can never silently drop an item).
    *
    * Invariant the spec pins: ivf_cosine ≤ exact_cosine always (the exact
    * arm maximizes over a superset), so verdict disagreement is one-sided —
    * the index can only MISS semantic matches, never invent them.
    */
  def semanticDecontamIvf(spark: SparkSession, sfDir: String,
      nCentroids: Int = 16, evalPermille: Int = 200, salt: String = "eval_v1",
      tau: Double = 0.4): DataFrame = {
    val isEval = Corpus.hashBucket(col("vec_id"), salt) < evalPermille
    val assigned = ivfAssigned(spark, sfDir, nCentroids)
    val q = assigned.filter(isEval)
      .select(col("vec_id").as("eval_id"), col("svec").as("qvec"),
        col("norm2").as("qnorm2"), col("cell").as("qcell"))
    val train = assigned.filter(!isEval)
    val w = Window.partitionBy(col("eval_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    val ivfNn = broadcast(q).join(train, col("qcell") === col("cell"))
      .select(col("eval_id"), col("vec_id"),
        cosine(col("qvec"), col("svec"), col("qnorm2"), col("norm2")).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("eval_id"), col("vec_id").as("ivf_nn_id"),
        col("cosine").as("ivf_cosine"))
    val exact = semanticDecontam(spark, sfDir, evalPermille, salt, tau)
      .select(col("doc_id").as("eval_id"),
        col("nn_train_id").as("exact_nn_id"), col("cosine").as("exact_cosine"),
        col("is_semantic_match").as("exact_match"))
    exact.join(ivfNn, Seq("eval_id"), "left")
      .select(col("eval_id").as("doc_id"), col("exact_nn_id"),
        col("exact_cosine"), col("exact_match"),
        col("ivf_nn_id"), col("ivf_cosine"),
        coalesce(col("ivf_nn_id") === col("exact_nn_id"), lit(false))
          .as("nn_recalled"),
        (coalesce(col("ivf_cosine") >= lit(tau), lit(false)) === col("exact_match"))
          .as("verdict_agrees"))
  }

  /** SEMANTIC LEAK BY SOURCE — the drop-the-feed triage (q338's shape) for
    * the PARAPHRASE channel: q354's per-eval verdicts rolled to the feed
    * that supplied the nearest neighbor — per training source, how many
    * eval items resolve their NN into it, how many of those are τ-matches,
    * and how many are paraphrase leaks the gram filter missed. A feed with
    * a high paraphrase share is rewording benchmark content (or the
    * benchmark was built from it) — the crawl owner's actionable unit,
    * exactly like q338's gram-channel rollup. Sources no eval NN lands in
    * keep a zero row off a static source spine (the q315 shape).
    *
    * Scale shape: the audit rides q354 verbatim (|eval| rows), the source
    * lookup is one narrow doc_id→source join, the rollup one |sources|-row
    * aggregate — cost is q354's plus epsilon.
    */
  def semanticLeakBySource(spark: SparkSession, sfDir: String,
      evalPermille: Int = 200, salt: String = "eval_v1",
      tau: Double = 0.4): DataFrame = {
    val sem = semanticDecontam(spark, sfDir, evalPermille, salt, tau)
    val src = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("nn_train_id"), col("source"))
    val agg = sem.join(src, "nn_train_id")
      .groupBy(col("source"))
      .agg(count_distinct(col("nn_train_id")).as("n_nn_docs"),
        count(lit(1)).as("n_eval_hits"),
        sum(when(col("is_semantic_match"), 1L).otherwise(0L))
          .as("n_semantic_matches"),
        sum(when(col("paraphrase_leak"), 1L).otherwise(0L))
          .as("n_paraphrase_leaks"))
    val spine = Tables.documents(spark, sfDir).select(col("source")).distinct()
    spine.join(agg, Seq("source"), "left")
      .select(col("source"),
        coalesce(col("n_nn_docs"), lit(0L)).as("n_nn_docs"),
        coalesce(col("n_eval_hits"), lit(0L)).as("n_eval_hits"),
        coalesce(col("n_semantic_matches"), lit(0L)).as("n_semantic_matches"),
        coalesce(col("n_paraphrase_leaks"), lit(0L)).as("n_paraphrase_leaks"),
        when(coalesce(col("n_eval_hits"), lit(0L)) > 0L,
          coalesce(col("n_paraphrase_leaks"), lit(0L)).cast("double") /
            col("n_eval_hits").cast("double")).as("paraphrase_share"))
  }

  /** Sign-LSH bucket key: bit i set iff component i+1 is non-negative. */
  private def signBucket(vec: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(vec, i + 1) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN via sign-LSH buckets: search only within the query's bucket. Recall is
    * tunable by bucket bits (fewer bits → bigger buckets → higher recall); the
    * scale path adds multi-probe (flip one bit) without changing the join shape.
    */
  def annBucketTopK(spark: SparkSession, sfDir: String, nQueries: Int = 20,
      k: Int = 3, bits: Int = 4): DataFrame = {
    val vecs = withScaled(Tables.embeddings(spark, sfDir))
      .withColumn("bucket", signBucket(col("svec"), bits))
    val q = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("svec").as("qvec"),
        col("norm2").as("qnorm2"), col("bucket").as("qbucket"))
    val cos = cosine(col("qvec"), col("svec"), col("qnorm2"), col("norm2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    broadcast(q).join(vecs,
        col("qbucket") === col("bucket") && col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), cos.as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rk").cast("long").as("rk"), col("cosine"))
  }

  /** RECALL@k OF THE SIGN-LSH ANN against the exact brute-force top-k —
    * the evaluation loop every approximate index ships with: per query,
    * |approx ∩ exact|/k. This is the number that justifies (or vetoes) the
    * bucket-bits setting before the index serves traffic — recall is
    * TUNABLE (fewer bits → bigger buckets → higher recall, more compute),
    * and this query is the tuning instrument. Both arms are the engine's
    * own oracle-gated queries ridden verbatim (q25 exact, q26 LSH) at the
    * same k; the intersection is one (query, neighbor) equi-join and the
    * recall one exact division. Scale shape: both arms broadcast the tiny
    * query side and stream the corpus once; the join runs on 2·|queries|·k
    * rows.
    */
  def annRecall(spark: SparkSession, sfDir: String,
      nQueries: Int = 20, k: Int = 3): DataFrame = {
    val exact = cosineTopK(spark, sfDir, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = annBucketTopK(spark, sfDir, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    exact.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), lit(k.toLong).as("k"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          lit(k.toDouble)).as("recall"))
  }

  /** IVF RECALL-vs-NPROBE CURVE — the tuning instrument for the IVF index's
    * one real knob: searching the query's top-`nprobe` cells instead of one
    * trades compute for recall, and this emits the whole curve (nprobe ∈
    * 1, 2, 4, 8) in one query so the 100 TB operator picks its operating
    * point from data, exactly as q315/q320 size the MinHash bands. Each
    * probe level routes every query to its `nprobe` highest-cosine
    * centroids, searches those cells ([[ivfTopK]]'s join shape — the
    * candidate set only widens, the shape never changes), takes top-k, and
    * scores against the exact brute-force top-k (q25's arm verbatim, the
    * q296 convention). Macro recall: total hits / (k·|queries|), queries
    * with empty probe rings still count in the denominator. All cosines the
    * exact integer-scaled arithmetic; one division per row.
    */
  def ivfRecallCurve(spark: SparkSession, sfDir: String, nCentroids: Int = 16,
      nQueries: Int = 20, k: Int = 3,
      probes: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    val assigned = ivfAssigned(spark, sfDir, nCentroids)
    val vecs = withScaled(Tables.embeddings(spark, sfDir))
    val cents = vecs.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("svec").as("cvec"),
        col("norm2").as("cnorm2"))
    val toCent = cosine(col("qvec"), col("cvec"), col("qnorm2"), col("cnorm2"))
    val wRoute = Window.partitionBy(col("query_id"))
      .orderBy(col("cent_cos").desc, col("cent_id").asc)
    val routed = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("svec").as("qvec"),
        col("norm2").as("qnorm2"))
      .join(broadcast(cents))
      .select(col("query_id"), col("qvec"), col("qnorm2"), col("cent_id"),
        toCent.as("cent_cos"))
      .withColumn("rn", row_number().over(wRoute))
      .filter(col("rn") <= probes.max)
    val exact = cosineTopK(spark, sfDir, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    val cos = cosine(col("qvec"), col("svec"), col("qnorm2"), col("norm2"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    probes.map { np =>
      val topk = routed.filter(col("rn") <= np)
        .select(col("query_id"), col("qvec"), col("qnorm2"),
          col("cent_id").as("cell"))
        .join(assigned, "cell")
        .filter(col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id"), cos.as("cosine"))
        .withColumn("rk", row_number().over(wTop))
        .filter(col("rk") <= k)
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
      topk.join(exact, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(np.toLong).as("nprobe"), lit(k.toLong).as("k"),
          lit(nQueries.toLong).as("n_queries"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)).cast("double") /
            lit((k * nQueries).toDouble)).as("recall"))
    }.reduce(_ unionByName _)
  }

  /** MULTI-PROBE SIGN-LSH RECALL — closes the scale path [[annBucketTopK]]'s
    * scaladoc names: beside searching the query's own bucket (ring 0), probe
    * ring 1 ALSO searches every bucket at Hamming distance 1 (one sign bit
    * flipped — the standard multi-probe LSH move, public in Lv et al. 2007),
    * multiplying candidates by ≤ bits+1 while the join stays a bucket
    * equi-join (the probe list is a per-query explode, never a widened
    * key space). Emits both rings' macro recall against the exact top-k in
    * one output so the probe-vs-compute trade reads directly.
    */
  def multiProbeRecall(spark: SparkSession, sfDir: String, nQueries: Int = 20,
      k: Int = 3, bits: Int = 4): DataFrame = {
    val vecs = withScaled(Tables.embeddings(spark, sfDir))
      .withColumn("bucket", signBucket(col("svec"), bits))
    val exact = cosineTopK(spark, sfDir, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    val cos = cosine(col("qvec"), col("svec"), col("qnorm2"), col("norm2"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    Seq(0, 1).map { ring =>
      val probeList =
        if (ring == 0) array(col("qbucket"))
        else array(col("qbucket") +:
          (0 until bits).map(i => col("qbucket").bitwiseXOR(lit(1L << i))): _*)
      val topk = vecs.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("svec").as("qvec"),
          col("norm2").as("qnorm2"), col("bucket").as("qbucket"))
        .withColumn("bucket", explode(probeList))
        .join(vecs.select(col("vec_id"), col("svec"), col("norm2"), col("bucket")),
          Seq("bucket"))
        .filter(col("query_id") =!= col("vec_id"))
        .select(col("query_id"), col("vec_id"), cos.as("cosine"))
        .withColumn("rk", row_number().over(wTop))
        .filter(col("rk") <= k)
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
      topk.join(exact, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(ring.toLong).as("probe_ring"), lit(k.toLong).as("k"),
          lit(nQueries.toLong).as("n_queries"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)).cast("double") /
            lit((k * nQueries).toDouble)).as("recall"))
    }.reduce(_ unionByName _)
  }

  /** CROSS-CORPUS semantic linkage — the two-table member of the ANN family:
    * every document of corpus A (even embedding labels) linked to its k
    * nearest in corpus B (odd labels), the record-linkage / retrieval-
    * augmentation shape, where the self-join forms (q26/q27) dedupe WITHIN
    * one corpus. Both sides are corpus-scale, so neither is broadcast: the
    * sign-LSH bucket equi-join co-partitions the two corpora on bucket and
    * the quadratic comparator runs only within buckets. A vectors whose
    * bucket holds no B vector surface no link (inner-join semantics —
    * multi-probe widens recall exactly as in [[nearDupPairs]]).
    */
  def crossCorpusLinks(spark: SparkSession, sfDir: String, k: Int = 3,
      bits: Int = 6): DataFrame = {
    val vecs = withScaled(Tables.embeddings(spark, sfDir))
      .withColumn("bucket", signBucket(col("svec"), bits))
    val a = vecs.filter(col("label") % 2 === 0)
      .select(col("vec_id").as("a_id"), col("svec").as("avec"),
        col("norm2").as("an2"), col("bucket"))
    val b = vecs.filter(col("label") % 2 === 1)
      .select(col("vec_id").as("b_id"), col("svec").as("bvec"),
        col("norm2").as("bn2"), col("bucket"))
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("cosine").desc, col("b_id").asc)
    a.join(b, "bucket")
      .select(col("a_id"), col("b_id"),
        cosine(col("avec"), col("bvec"), col("an2"), col("bn2")).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("a_id"), col("b_id"), col("rk").cast("long").as("rk"), col("cosine"))
  }

  /** IVF-style ANN: a fixed coarse quantizer (the first `nCentroids` vectors
    * serve as deterministic centroids) assigns every vector to its nearest
    * cell in ONE broadcast pass (n·k cosines, linear); a query then searches
    * only its own cell via an equi-join on the cell id. This is the inverted-
    * file shape — quantize, route, search-within-cell — with the k-means
    * training step replaced by fixed seeds so every stage stays deterministic
    * and oracle-checkable. Recall improves with multi-cell probing exactly
    * like [[nearDupPairs]]'s probe ring; the join shape is unchanged.
    */
  def ivfTopK(spark: SparkSession, sfDir: String, nCentroids: Int = 16,
      nQueries: Int = 20, k: Int = 3): DataFrame = {
    val assigned = ivfAssigned(spark, sfDir, nCentroids)
    val q = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("svec").as("qvec"),
        col("norm2").as("qnorm2"), col("cell").as("qcell"))
    val cos = cosine(col("qvec"), col("svec"), col("qnorm2"), col("norm2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    broadcast(q).join(assigned,
        col("qcell") === col("cell") && col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), cos.as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rk").cast("long").as("rk"), col("cosine"))
  }

  /** The IVF cell table (vec_id, svec, norm2, cell): every vector assigned
    * to its max-cosine coarse centroid — [[ivfTopK]] and [[ivfPqTopK]] share
    * this inverted-list structure.
    */
  private def ivfAssigned(spark: SparkSession, sfDir: String,
      nCentroids: Int): DataFrame = {
    val vecs = withScaled(Tables.embeddings(spark, sfDir))
    val cents = vecs.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cent_id"), col("svec").as("cvec"), col("norm2").as("cnorm2"))
    val toCent = cosine(col("svec"), col("cvec"), col("norm2"), col("cnorm2"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cent_cos").desc, col("cent_id").asc)
    vecs.join(broadcast(cents))
      .select(col("vec_id"), col("svec"), col("norm2"), col("cent_id"), toCent.as("cent_cos"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("svec"), col("norm2"), col("cent_id").as("cell"))
  }

  /** One Lloyd iteration of k-means over the embedding corpus — the training
    * step [[ivfTopK]]'s fixed quantizer deliberately skips. Seeds are the
    * first `k` vectors; every vector is assigned to its max-cosine seed
    * (`cell0`), centroids are recomputed as the component-wise mean of each
    * cell, and vectors are reassigned (`cell1`). Iterating this to a fixpoint
    * is full k-means ([[kmeans]]); ONE step is emitted here because it is
    * exactly SQL-expressible for the oracle gate.
    *
    * Determinism: centroid components are floor(Σ svec_i / n) — exact int64
    * sums, one IEEE double division, floor back to int64 — so the recomputed
    * centroid is bit-identical across engines and partitionings, and cosine
    * against it reuses the exact integer dot product. (Components are ≤1e8 in
    * magnitude, so a 64-dim dot against a floored-mean centroid stays far
    * from int64 overflow; cosine against the raw SUM vector would not.)
    *
    * Scale shape: assignment is a broadcast of k centroids against one corpus
    * scan (n·k cosines); the recompute is a two-level hash aggregate keyed by
    * (cell, dim) — 64·k rows through the shuffle, never vectors. This is the
    * standard distributed-k-means round.
    */
  /** Per-dimension int8 scalar quantization of the embedding corpus — the
    * compression step a 100 TB vector store runs before ANN (4 bytes/dim →
    * 1): each dimension maps affinely onto [0, 255] between its corpus-wide
    * min and max. All arithmetic stays in the exact-int domain of the scaled
    * vectors (`(x−mn)·255 div span`, the div spelled as subtract-pmod so both
    * engines produce the identical integer), so the codes are bit-equal
    * cross-engine and the oracle gate hash-checks them.
    *
    * Scale shape: the stats pass explodes to (dim, value) pairs but the
    * partial hash-agg reduces each partition to 64 rows before the exchange;
    * the 64-entry min/max arrays then broadcast back over one corpus scan.
    * Nothing driver-side, nothing quadratic.
    */
  def quantizeVecs(spark: SparkSession, sfDir: String): DataFrame =
    withQuantized(spark, sfDir).select(col("vec_id"), col("qvec"))

  /** ANN over the int8-quantized corpus: codes are dequantized back to the
    * scaled-int domain (`mn + q·span div 255` — exact ints again) and ranked
    * with the same native cosine as [[cosineTopK]]. The spec pins recall
    * against the exact top-k; the oracle gate hash-checks the quantized
    * ranking itself, which is deterministic because every dot/norm is an
    * exact int64 into one final sqrt/division.
    */
  def quantizedTopK(spark: SparkSession, sfDir: String, nQueries: Int = 20,
      k: Int = 5): DataFrame = {
    val deq = withQuantized(spark, sfDir)
      .withColumn("rvec", transform(col("qvec"), (q, i) => {
        val mn = element_at(col("mns"), i + 1)
        val span = element_at(col("mxs"), i + 1) - mn
        val p = q * span
        mn + ((p - pmod(p, lit(255L))) / lit(255L)).cast("long")
      }))
      .select(col("vec_id"), col("rvec"))
    val q = deq.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("rvec").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    broadcast(q).join(deq, col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        graft.functions.CosineSimExpr(col("qv"), col("rvec")).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rk").cast("long").as("rk"), col("cosine"))
  }

  /** Scaled vectors + their quantization codes + the broadcast per-dim
    * min/max arrays (needed again for dequantization).
    */
  private val quantStatsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private[graft] def withQuantized(spark: SparkSession, sfDir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), scaled(col("embedding")).as("svec"))
    // eagerly materialized ONCE per (session, sf): the stats subtree scans the
    // whole corpus, and its consumers (quantize + dequantize, query + corpus
    // sides, q89 AND q90) would each re-run that scan — the memoized
    // checkpoint pins it to ONE pass for a one-row frame (ExplainAudit showed
    // 8 exchanges / 4 corpus scans without the checkpoint; round-7 advice
    // flagged the per-call re-scan the memo now removes)
    val statsRow = Dedup.cached(quantStatsCache, "quant_stats", spark, sfDir) {
      vecs
        .select(posexplode(col("svec")).as(Seq("d", "x")))
        .groupBy(col("d")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
        .agg(
          collect_list(struct(col("d"), col("mn"))).as("mns0"),
          collect_list(struct(col("d"), col("mx"))).as("mxs0"))
        .select(
          transform(array_sort(col("mns0")), s => s.getField("mn")).as("mns"),
          transform(array_sort(col("mxs0")), s => s.getField("mx")).as("mxs"))
    }
    vecs.crossJoin(broadcast(statsRow))
      .withColumn("qvec", transform(col("svec"), (x, i) => {
        val mn = element_at(col("mns"), i + 1)
        val span = element_at(col("mxs"), i + 1) - mn
        val v = (x - mn) * lit(255L)
        when(span > 0L, ((v - pmod(v, span)) / span).cast("long"))
          .otherwise(lit(0L))
      }))
  }

  /** The q77 one-step Lloyd state, factored for the cluster-quality audits
    * (q269 silhouette / q270 Davies–Bouldin): the initial assignment frame
    * (with svec/norm2 kept) and the updated integer centroids.
    */
  private def oneStepState(spark: SparkSession, sfDir: String,
      k: Int): (DataFrame, DataFrame) = {
    val vecs = withScaled(Tables.embeddings(spark, sfDir))
    val assigned0 = assignCells(
      vecs,
      vecs.filter(col("vec_id") < k)
        .select(col("vec_id").as("cent_id"), col("svec").as("cvec"), col("norm2").as("cnorm2")),
      "cell0")
    val cents1 = assigned0
      .select(col("cell0"), posexplode(col("svec")).as(Seq("pos", "v")))
      .groupBy(col("cell0"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .select(col("cell0"),  col("pos"),
        floor(col("s").cast("double") / col("c")).cast("long").as("comp"))
      .groupBy(col("cell0"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("comp")))),
        x => x.getField("comp")).as("cvec"))
      .select(col("cell0").as("cent_id"), col("cvec"),
        idot(col("cvec"), col("cvec")).as("cnorm2"))
    (assigned0, cents1)
  }

  def kmeansStep(spark: SparkSession, sfDir: String, k: Int = 16): DataFrame = {
    val (assigned0, cents1) = oneStepState(spark, sfDir, k)
    assignCells(assigned0, cents1, "cell1")
      .select(col("vec_id"), col("cell0"), col("cell1"))
  }

  /** Per-vector top-2 centroid cosines over the one-step centroids — the
    * shared scoring pass under [[silhouette]] and [[daviesBouldin]]: cos1
    * is the cosine to the OWN (argmax) centroid, cos2 to the runner-up.
    */
  private def top2Centroids(spark: SparkSession, sfDir: String,
      k: Int): (DataFrame, DataFrame) = {
    val (assigned0, cents1) = oneStepState(spark, sfDir, k)
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cent_cos").desc, col("cent_id").asc)
    val top2 = assigned0.join(broadcast(cents1))
      .withColumn("cent_cos", cosine(col("svec"), col("cvec"), col("norm2"), col("cnorm2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy(col("vec_id"))
      .agg(min(when(col("rn") === 1, col("cent_id"))).as("cell"),
        min(when(col("rn") === 1, col("cent_cos"))).as("cos1"),
        min(when(col("rn") === 2, col("cent_cos"))).as("cos2"))
    (top2, cents1)
  }

  /** SIMPLIFIED SILHOUETTE per cluster (Hruschka et al. 2004, public — the
    * centroid form of Rousseeuw 1987) over the q77 one-step k-means state,
    * in the COSINE-DISTANCE domain the assignment itself uses: a = 1 −
    * cos(x, own centroid), b = 1 − cos(x, runner-up centroid) — because
    * assignment is argmax-cosine, the runner-up IS the nearest other
    * centroid — s = (b − a)/max(a, b). This is the cluster-quality audit
    * run after ANY clustering lands in a pipeline, and the centroid form
    * is THE 100 TB spelling: the full Rousseeuw silhouette is all-pairs
    * within clusters (unshippable); this is one scan × k broadcast
    * centroids. Determinism: cosines are the engine's exact-integer-dot
    * fixed trees; per-vector s is a fixed tree over them (ties in the
    * top-2 window break on cent_id); per-cluster means fold s quantized to
    * 12 decimals (the q233 recipe).
    */
  def silhouette(spark: SparkSession, sfDir: String, k: Int = 16): DataFrame = {
    val (top2, _) = top2Centroids(spark, sfDir, k)
    val a = lit(1.0) - col("cos1")
    val b = lit(1.0) - col("cos2")
    val s = when(greatest(a, b) > 0, (b - a) / greatest(a, b)).otherwise(lit(0.0))
    def q12(c: Column): Column = c.cast("string").cast(org.apache.spark.sql.types.DecimalType(28, 12))
    val perCell = top2.select(col("cell"), s.as("sil"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"), sum(q12(col("sil"))).as("ssum"),
        min(col("sil")).as("min_sil"), max(col("sil")).as("max_sil"))
    val overall = perCell.agg(sum(col("ssum")).as("tsum"), sum(col("n_vecs")).as("tn"))
    perCell.crossJoin(broadcast(overall))
      .select(col("cell"), col("n_vecs"),
        (graft.core.Num.decToDouble(col("ssum")) / col("n_vecs").cast("double"))
          .as("mean_sil"),
        col("min_sil"), col("max_sil"),
        (graft.core.Num.decToDouble(col("tsum")) / col("tn").cast("double"))
          .as("overall_mean_sil"))
  }

  /** DAVIES–BOULDIN INDEX (Davies & Bouldin 1979, public) over the same
    * one-step state and the same cosine-distance domain: per-cluster
    * scatter Sᵢ = mean(1 − cos(x, own centroid)) (own = cos1, the argmax),
    * centroid separation Mᵢⱼ = 1 − cos(cᵢ, cⱼ), DB = (1/k)·Σᵢ maxⱼ≠ᵢ
    * (Sᵢ+Sⱼ)/Mᵢⱼ. Everything after the one scoring scan runs on k and k²
    * rows; scatters fold 12-decimal-quantized, each ratio is a fixed tree,
    * the max breaks ties by partner id, and the final mean folds the k
    * quantized ratios exactly. Output: one row per cluster (its scatter,
    * worst partner, ratio) with the index repeated — the q243 convention.
    */
  def daviesBouldin(spark: SparkSession, sfDir: String, k: Int = 16): DataFrame = {
    val (top2, cents1) = top2Centroids(spark, sfDir, k)
    def q12(c: Column): Column = c.cast("string").cast(org.apache.spark.sql.types.DecimalType(28, 12))
    val scatter = top2
      .select(col("cell"), (lit(1.0) - col("cos1")).as("d"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"), sum(q12(col("d"))).as("dsum"))
      .select(col("cell"), col("n_vecs"),
        (graft.core.Num.decToDouble(col("dsum")) / col("n_vecs").cast("double"))
          .as("s_i"))
    val m = cents1.as("i").crossJoin(broadcast(cents1.as("j")))
      .filter(col("i.cent_id") =!= col("j.cent_id"))
      .select(col("i.cent_id").as("cell"), col("j.cent_id").as("partner"),
        (lit(1.0) - cosine(col("i.cvec"), col("j.cvec"),
          col("i.cnorm2"), col("j.cnorm2"))).as("m_ij"))
    val ratios = m.join(broadcast(scatter), "cell")
      .join(broadcast(scatter.select(col("cell").as("partner"), col("s_i").as("s_j"))),
        "partner")
      .select(col("cell"), col("partner"),
        when(col("m_ij") > 0, (col("s_i") + col("s_j")) / col("m_ij")).as("ratio"))
    val wWorst = Window.partitionBy(col("cell"))
      .orderBy(col("ratio").desc, col("partner").asc)
    val worst = ratios.withColumn("rn", row_number().over(wWorst))
      .filter(col("rn") === 1)
      .select(col("cell"), col("partner").as("worst_partner"), col("ratio"))
    val db = worst.agg(
      (graft.core.Num.decToDouble(sum(q12(col("ratio")))) /
        count(lit(1)).cast("double")).as("db_index"))
    worst.join(broadcast(scatter.select(col("cell"), col("n_vecs"), col("s_i"))), "cell")
      .crossJoin(broadcast(db))
      .select(col("cell"), col("n_vecs"), col("s_i"), col("worst_partner"),
        col("ratio"), col("db_index"))
  }

  /** HARD-NEGATIVE TRIPLET MINING over the IVF cells — the candidate
    * generator for contrastive embedding training: for every vector, its
    * most-similar SAME-label neighbor (the anchor-positive) and its
    * most-similar DIFFERENT-label neighbor (the hard negative) within its
    * IVF cell, with the triplet margin and a violation flag (negative
    * closer than positive — exactly the pairs a triplet loss needs).
    * Candidate scope is the cell BY DESIGN: mining against the full corpus
    * is the all-pairs shape that cannot ship at 100 TB, and a hard negative
    * is by definition nearby, which is what the coarse quantizer indexes —
    * the standard ANN-backed mining loop (probe more cells for recall,
    * same join shape). Vectors whose cell holds no same/different-label
    * peer report NULLs (visible, not dropped). Determinism: exact-int
    * cosines, ties by neighbor id, margin a subtraction of identical
    * doubles.
    */
  def hardNegatives(spark: SparkSession, sfDir: String, nCentroids: Int = 16): DataFrame = {
    val lab = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("label"))
    val av = ivfAssigned(spark, sfDir, nCentroids).join(lab, "vec_id")
    val a = av.select(col("vec_id").as("va"), col("svec").as("avec"),
      col("norm2").as("an2"), col("cell"), col("label").as("la"))
    val b = av.select(col("vec_id").as("vb"), col("svec").as("bvec"),
      col("norm2").as("bn2"), col("cell"), col("label").as("lb"))
    val w = Window.partitionBy(col("va"), col("same"))
      .orderBy(col("cos").desc, col("vb").asc)
    val best = a.join(b, Seq("cell")).filter(col("va") =!= col("vb"))
      .withColumn("cos", cosine(col("avec"), col("bvec"), col("an2"), col("bn2")))
      .withColumn("same", col("la") === col("lb"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val pos = best.filter(col("same"))
      .select(col("va").as("vec_id"), col("vb").as("pos_id"), col("cos").as("pos_cos"))
    val neg = best.filter(!col("same"))
      .select(col("va").as("vec_id"), col("vb").as("neg_id"), col("cos").as("neg_cos"))
    lab
      .join(pos, Seq("vec_id"), "left")
      .join(neg, Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"), col("pos_id"), col("pos_cos"),
        col("neg_id"), col("neg_cos"),
        (col("pos_cos") - col("neg_cos")).as("margin"),
        (col("neg_cos") > col("pos_cos")).as("violated"))
  }

  /** CLASS-SEPARATION AUDIT of the embedding space (silhouette-lite): each
    * label's centroid is the floored component-wise mean (the [[kmeansStep]]
    * exact-int recipe), and every vector scores cosine to its OWN centroid
    * vs its best OTHER centroid — rolled up per label as mean own/other
    * cosine, mean margin, and the count a nearest-centroid classifier would
    * misassign. The pre-training health check on labeled embeddings: a
    * label whose margin ≈ 0 contributes noise, not signal. Scale shape:
    * centroids are a (label × dim)-keyed aggregate (vectors never shuffle
    * whole), the |labels|-row centroid table broadcasts against one corpus
    * scan, and per-label means fold 12-decimal-quantized terms exactly.
    */
  def classSeparation(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val lab = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("label"))
    val vecs = withScaled(Tables.embeddings(spark, sfDir)).join(lab, "vec_id")
    val cents = vecs
      .select(col("label").as("clabel"), posexplode(col("svec")).as(Seq("pos", "v")))
      .groupBy(col("clabel"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .select(col("clabel"), col("pos"),
        floor(col("s").cast("double") / col("c")).cast("long").as("comp"))
      .groupBy(col("clabel"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("comp")))),
        x => x.getField("comp")).as("cvec"))
      .withColumn("cnorm2", idot(col("cvec"), col("cvec")))
    val scoredAll = vecs.join(broadcast(cents))
      .withColumn("cos", cosine(col("svec"), col("cvec"), col("norm2"), col("cnorm2")))
    val own = scoredAll.filter(col("label") === col("clabel"))
      .select(col("vec_id"), col("label"), col("cos").as("own_cos"))
    val wBest = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("clabel").asc)
    val other = scoredAll.filter(col("label") =!= col("clabel"))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cos").as("other_cos"))
    def q12(c: Column): Column = c.cast("string").cast(org.apache.spark.sql.types.DecimalType(18, 12))
    own.join(other, "vec_id")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        (graft.core.Num.decToDouble(sum(q12(col("own_cos")))) /
          count(lit(1)).cast("double")).as("avg_own_cos"),
        (graft.core.Num.decToDouble(sum(q12(col("other_cos")))) /
          count(lit(1)).cast("double")).as("avg_other_cos"),
        (graft.core.Num.decToDouble(sum(q12(col("own_cos") - col("other_cos")))) /
          count(lit(1)).cast("double")).as("avg_margin"),
        sum(when(col("other_cos") > col("own_cos"), 1L).otherwise(0L))
          .as("n_misassigned"))
  }

  /** TOP PRINCIPAL COMPONENT of the embedding corpus by POWER ITERATION —
    * distributed PCA's first step (the direction a whitening / dim-reduction
    * pass removes first). Phase 1 (the only corpus-sized job): the centered
    * Gram matrix G = Σ (x−μ)(x−μ)ᵀ — μ is the floored exact-int mean (the
    * [[kmeansStep]] recipe) so deviations stay int64, per-vector outer
    * products fan out d² rows and fold exactly in DECIMAL(38,0)/HUGEINT.
    * O(n·d²) — the standard covariance shape; at larger d swap in a sketch
    * or sampled Gram, same algebra. Phase 2: `rounds` power iterations on
    * the 64×64 BRIDGED Gram — every matrix-vector product folds
    * DECIMAL(38,12)-quantized terms exactly, each round max-scales then
    * L2-normalizes (two divisions of identical doubles), so the iteration
    * is bit-reproducible and the oracle unrolls it as CTEs. λ is the
    * Rayleigh quotient at the final vector. Starting vector e₀ and the
    * round count are part of the operator contract (power iteration from a
    * fixed start is deterministic; this corpus's near-uniform synthetic
    * spectrum converges slowly, so the default is 8 rounds, with the
    * residual monitored by the spec).
    */
  def pcaPower(spark: SparkSession, sfDir: String, rounds: Int = 8): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val vecs = withScaled(Tables.embeddings(spark, sfDir))
    val mu = vecs.select(posexplode(col("svec")).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(floor(sum(col("v")).cast("double") / count(lit(1))).cast("long").as("m"))
    val dev = vecs.select(col("vec_id"), posexplode(col("svec")).as(Seq("pos", "v")))
      .join(broadcast(mu), "pos")
      .select(col("vec_id"), col("pos").as("i"), (col("v") - col("m")).as("d"))
    val gRaw = dev.as("a").join(dev.as("b"), Seq("vec_id"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum((col("a.d") * col("b.d")).cast(DecimalType(38, 0))).as("gsum"))
      .select(col("i"), col("j"), Num.decToDouble(col("gsum")).as("gv"))
      .localCheckpoint(true) // 64×64 rows; pay the Gram once, reuse per round
    // Power iteration is scale-invariant, so normalize G by its max entry
    // FIRST: every bridged product then lives in [−64, 64], where the
    // 12-decimal grid is ≫ the double's ulp (the q195 magnitude rule — raw
    // Gram entries reach 10¹⁶⁺, where ulp exceeds the grid and the JVM's
    // non-shortest Double.toString diverges from C's shortest form). λ
    // rescales by the same max at the end.
    val gMax = gRaw.agg(max(abs(col("gv"))).as("gm"))
    val gBridged = gRaw.crossJoin(broadcast(gMax))
      .select(col("i"), col("j"), (col("gv") / col("gm")).as("gv"))
      .localCheckpoint(true)
    def q12(c: Column): Column = c.cast("string").cast(org.apache.spark.sql.types.DecimalType(18, 12))
    def matVec(v: DataFrame, out: String): DataFrame =
      gBridged.join(broadcast(v), "j")
        .groupBy(col("i"))
        .agg(Num.decToDouble(sum(q12(col("gv") * col("vv")))).as(out))
    var v = spark.range(0, 64).select(col("id").as("j"),
      when(col("id") === 0, lit(1.0)).otherwise(lit(0.0)).as("vv"))
    for (_ <- 1 to rounds) {
      val w = matVec(v, "w")
      val m = w.agg(max(abs(col("w"))).as("m"))
      val u = w.crossJoin(broadcast(m)).select(col("i"), (col("w") / col("m")).as("u"))
      val norm = u.agg(
        sqrt(Num.decToDouble(sum(q12(col("u") * col("u"))))).as("nrm"))
      v = u.crossJoin(broadcast(norm))
        .select(col("i").as("j"), (col("u") / col("nrm")).as("vv"))
        .localCheckpoint(true)
    }
    val r = matVec(v, "r")
    val lam = r.join(v.select(col("j").as("i"), col("vv")), "i")
      .agg((Num.decToDouble(sum(q12(col("vv") * col("r")))) /
        Num.decToDouble(sum(q12(col("vv") * col("vv"))))).as("lambda_scaled"))
    v.select(col("j").cast("long").as("dim"), col("vv").as("component"))
      .crossJoin(broadcast(lam)).crossJoin(broadcast(gMax))
      .select(col("dim"), col("component"),
        (col("lambda_scaled") * col("gm")).as("lambda"))
  }

  /** JOHNSON–LINDENSTRAUSS RANDOM-PROJECTION DISTORTION AUDIT: project the
    * 64-dim corpus onto `m` = 16 dimensions with a DETERMINISTIC ±1 sign
    * matrix (sign = parity of a byte of md5("k:d") — content-addressed, so
    * both engines and every executor derive the identical matrix with no
    * shipped state), then report, for each query–corpus pair, the exact
    * squared distance in both spaces and the JL ratio (proj²/m) / orig².
    * This is the audit a 100 TB pipeline runs BEFORE swapping ANN to the
    * projected space — the ratio histogram tells you if m is high enough.
    * Exactness: original d² folds in int64 (bounded by 64·(2·10⁸)²), the
    * projection is an exact int64 sum of ±svec components, projected d²
    * folds per-element in DECIMAL(38,0)/HUGEINT, and only the final ratio
    * divides into doubles. Scale shape: the projection is one d²-free
    * per-element aggregate (n·d·m rows through a map-side-combined
    * groupBy); the pair audit scopes to the broadcast query set.
    */
  def jlDistortion(spark: SparkSession, sfDir: String, m: Int = 16,
      nQueries: Int = 20): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val signs = spark.range(0, m.toLong).select(col("id").as("k"))
      .crossJoin(spark.range(0, 64).select(col("id").as("pos")))
      .select(col("k"), col("pos"),
        (when(conv(substring(md5(concat(col("k"), lit(":"), col("pos"))), 1, 2),
          16, 10).cast("long") % 2 === 0, 1L).otherwise(-1L)).as("sign"))
    val elems = withScaled(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), posexplode(col("svec")).as(Seq("pos", "v")))
    val proj = elems.join(broadcast(signs), "pos")
      .groupBy(col("vec_id"), col("k"))
      .agg(sum(col("sign") * col("v")).as("p"))
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("k"), col("p")))),
        x => x.getField("p")).as("pvec"))
    val full = withScaled(Tables.embeddings(spark, sfDir)).join(proj, "vec_id")
    val queries = full.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("svec").as("qvec"), col("pvec").as("qp"))
    val d2orig = aggregate(zip_with(col("qvec"), col("svec"),
      (x, y) => (x - y) * (x - y)), lit(0L), (acc, t) => acc + t)
    val zero = lit(0).cast(DecimalType(38, 0))
    val d2proj = aggregate(zip_with(col("qp"), col("pvec"),
      (x, y) => ((x - y).cast(DecimalType(19, 0)) * (x - y)).cast(DecimalType(38, 0))),
      zero, (acc, t) => (acc + t).cast(DecimalType(38, 0)))
    broadcast(queries).join(full, col("query_id") < col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        d2orig.as("d2_orig"),
        Num.decToDouble(d2proj).as("d2_proj"),
        ((Num.decToDouble(d2proj) / lit(m.toDouble)) /
          col("d2_orig").cast("double")).as("jl_ratio"))
  }

  /** Assign every row of `vecs` (vec_id, svec, norm2, …) to its max-cosine
    * centroid (ties → lowest cent_id); the assignment lands in `cellCol`.
    */
  private def assignCells(vecs: DataFrame, cents: DataFrame, cellCol: String): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cent_cos").desc, col("cent_id").asc)
    vecs.join(broadcast(cents))
      .withColumn("cent_cos", cosine(col("svec"), col("cvec"), col("norm2"), col("cnorm2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("cvec", "cnorm2", "cent_cos", "rn")
      .withColumnRenamed("cent_id", cellCol)
  }

  /** Full k-means: [[kmeansStep]]'s round iterated `maxIters` times (or until
    * no assignment changes). Not oracle-gated (SQL has no fixpoint); the
    * convergence behavior is pinned by SimilaritySpec instead.
    */
  def kmeans(spark: SparkSession, sfDir: String, k: Int = 16, maxIters: Int = 10): DataFrame = {
    val vecs = withScaled(Tables.embeddings(spark, sfDir)).localCheckpoint(true)
    var cents = vecs.filter(col("vec_id") < k)
      .select(col("vec_id").as("cent_id"), col("svec").as("cvec"), col("norm2").as("cnorm2"))
    var assigned = assignCells(vecs, cents, "cell").localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      cents = assigned
        .select(col("cell"), posexplode(col("svec")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
        .select(col("cell"), col("pos"),
          floor(col("s").cast("double") / col("c")).cast("long").as("comp"))
        .groupBy(col("cell"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("comp")))),
          x => x.getField("comp")).as("cvec"))
        .select(col("cell").as("cent_id"), col("cvec"),
          idot(col("cvec"), col("cvec")).as("cnorm2"))
      val next = assignCells(vecs, cents, "cell").localCheckpoint(true)
      converged = next.as("n")
        .join(assigned.as("p"), col("n.vec_id") === col("p.vec_id"))
        .filter(col("n.cell") =!= col("p.cell"))
        .limit(1).count() == 0
      assigned = next
      iter += 1
    }
    assigned.select(col("vec_id"), col("cell"))
  }

  /** Embedding-cosine near-dup pairs, LSH-blocked with multi-probe: candidate
    * pairs have sign buckets within Hamming distance 1 (6 bits → 64 buckets, so
    * per-bucket population is n/64 and within-bucket pair work is (n/64)²·64 =
    * n²/64 — the bits knob trades candidate volume against recall, and the
    * 1-bit probe ring recovers most of the recall lost to the finer buckets).
    * Survivors exceed the cosine threshold. (Threshold 0.3 on this corpus —
    * unit-norm random vectors, max off-diagonal cosine ≈ 0.51.)
    *
    * The probe explode sits on one join side only, and a pair's buckets match
    * exactly one probe — no duplicate pairs, no post-join distinct.
    */
  def nearDupPairs(spark: SparkSession, sfDir: String,
      bits: Int = 6, threshold: Double = 0.3): DataFrame = {
    val vecs = withScaled(Tables.embeddings(spark, sfDir))
      .withColumn("bucket", signBucket(col("svec"), bits))
    val probes = (0 until bits).map(i => col("bucket").bitwiseXOR(lit(1L << i))) :+ col("bucket")
    val a = vecs.as("a")
    val b = vecs.withColumn("probe", explode(array(probes: _*))).as("b")
    val cos = cosine(col("a.svec"), col("b.svec"), col("a.norm2"), col("b.norm2"))
    a.join(b,
        col("a.bucket") === col("b.probe") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), cos.as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** SemDeDup-style embedding duplicate families (q108): connected
    * components over the verified cosine near-dup pairs ([[nearDupPairs]] —
    * sign-LSH-blocked, never all-pairs), each vector labelled with its
    * family and the minimum-id member elected representative. The
    * embedding-space twin of the MinHash path's q55: lexical dedup catches
    * copies, embedding dedup catches PARAPHRASES (Abbas et al., "SemDeDup",
    * 2023 — there k-means cells block the pairs; here the sign-LSH buckets
    * do, which keeps every stage oracle-expressible).
    *
    * Scale shape: pair generation is the bucketed O(n²/2^bits) of q27;
    * clustering is the same O(log n)-round star rewiring as the document
    * chain, over edges that carry two longs each.
    */
  def embeddingDupClusters(spark: SparkSession, sfDir: String,
      bits: Int = 6, threshold: Double = 0.3): DataFrame = {
    val vecs = Tables.embeddings(spark, sfDir).select(col("vec_id").as("id"))
    val edges = nearDupPairs(spark, sfDir, bits, threshold)
      .select(col("vec_a").as("src"), col("vec_b").as("dst"))
    Graph.connectedComponents(vecs, edges)
      .select(col("id").as("vec_id"), col("component").as("cluster_id"),
        (col("id") === col("component")).as("is_representative"))
  }

  // ---------------------------------------------------------------------
  // Product quantization (Jégou et al., "Product Quantization for Nearest
  // Neighbor Search", 2011) — the canonical 100 TB ANN compression: each
  // vector splits into PqM subvectors, each subvector quantizes to one of
  // PqK learned centroids, and a vector is stored as PqM small codes
  // (8 bytes here vs 256 bytes of floats — 32×). Search is ASYMMETRIC
  // distance: the query stays full-precision and scores a candidate with
  // PqM table lookups instead of a 64-dim dot product.
  //
  // Everything runs in the scaled-int domain with L2 assignment
  // (argmin |c|² − 2·x·c; |x|² is constant per subvector), floored-mean
  // centroid updates, and a FIXED number of Lloyd refinements — so codebook
  // training, codes, and search are all deterministic and the DuckDB oracle
  // replays the identical iterations as unrolled CTEs (q106/q107 are
  // hash-gated, unlike typical ANN demos).
  // ---------------------------------------------------------------------

  val PqM = 8        // subspaces
  val PqSubDim = 8   // dims per subspace (PqM · PqSubDim = 64)
  val PqK = 16       // centroids per subspace
  val PqIters = 2    // fixed Lloyd refinements (unrolled in the oracle)

  /** (vec_id, m, sub): every vector exploded into its PqM scaled-int
    * subvectors — the frame codebook training and encoding share.
    */
  private def subvecs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), scaled(col("embedding")).as("svec"))
      .select(col("vec_id"), posexplode(array(
        (0 until PqM).map(m => slice(col("svec"), m * PqSubDim + 1, PqSubDim)): _*))
        .as(Seq("m", "sub")))
      .withColumn("m", col("m").cast("long"))

  /** Assign every (vec_id, m) subvector to its nearest centroid in subspace
    * m: argmin over |c|² − 2·x·c (exact int64; ties → lowest cent_id).
    */
  private def assignPq(sub: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"), col("m"))
      .orderBy(col("score").asc, col("cent_id").asc)
    sub.join(broadcast(cents), Seq("m"))
      .withColumn("score",
        idot(col("cvec"), col("cvec")) - lit(2L) * idot(col("sub"), col("cvec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("m"), col("sub"), col("cent_id"))
  }

  /** Floored-mean centroid update per (subspace, cell) — exact cross-engine. */
  private def updatePq(assigned: DataFrame): DataFrame =
    assigned
      .select(col("m"), col("cent_id").as("cell"), posexplode(col("sub")).as(Seq("pos", "v")))
      .groupBy(col("m"), col("cell"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .select(col("m"), col("cell"),  col("pos"),
        floor(col("s").cast("double") / col("c")).cast("long").as("comp"))
      .groupBy(col("m"), col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("comp")))),
        x => x.getField("comp")).as("cvec"))
      .select(col("m"), col("cell").as("cent_id"), col("cvec"))

  private val pqCodebookCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** The trained codebook (m, cent_id, cvec), memoized per (session, sf) —
    * q106 (codes) and q107 (search) share one training run, the way a
    * production index shares one stored codebook. Init = subvectors of the
    * first PqK vectors (the kmeans init convention), then PqIters Lloyd
    * rounds; all PqM subspaces train TOGETHER in one keyed frame, so a round
    * is one broadcast join + two hash aggregates regardless of PqM. At
    * 100 TB the codebook trains on a sample — it is PqM·PqK rows of
    * PqSubDim ints no matter the corpus size.
    */
  private[graft] def pqCodebook(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.cached(pqCodebookCache, "pq_codebook", spark, sfDir) {
      val sub = subvecs(spark, sfDir)
      var cents = sub.filter(col("vec_id") < PqK)
        .select(col("m"), col("vec_id").as("cent_id"), col("sub").as("cvec"))
      for (_ <- 1 to PqIters)
        cents = updatePq(assignPq(sub, cents)).localCheckpoint(true)
      cents
    }

  /** PQ encoding (q106): every vector reduced to PqM codes — long form
    * (vec_id, m, code), the narrow shape the oracle hashes. 8 bytes/vector
    * at the design point; the only full-corpus work is one assignment pass.
    */
  def pqCodes(spark: SparkSession, sfDir: String): DataFrame =
    assignPq(subvecs(spark, sfDir), pqCodebook(spark, sfDir))
      .select(col("vec_id"), col("m"), col("cent_id").as("code"))

  /** PQ ANN search via asymmetric distance (q107): queries keep full
    * precision; each candidate's dot product and squared norm are
    * approximated from its codes with PqM lookups into the per-query tables
    * (pdot = q_sub·c, cnorm2 = |c|²), then ranked by the approximate cosine.
    *
    * Scale shape: the lookup tables are |queries|·PqM·PqK narrow rows —
    * broadcast; the corpus side contributes its CODES only (PqM rows per
    * vector, no vectors), so the scoring aggregate touches PqM ints per
    * (query, candidate) where exact search touches all 64 dims. The recall
    * bound against exact top-k is spec-pinned; the ranking itself is
    * hash-gated (exact ints into one final sqrt/division).
    */
  /** The PRODUCTION PQ search (q107): ADC shortlist → EXACT rerank. Pure ADC
    * ranking over 32-bit codes is the lossy recall tier ([[pqTopK]]; ~0.3
    * recall@5 here — spec-pinned floor); real deployments rerank the ADC
    * shortlist with exact distances over the shortlist's full vectors, which
    * restores recall while touching only |queries|·shortlist full vectors
    * instead of the corpus. The rerank join hydrates exactly the shortlist
    * rows — at 100 TB that is the difference between re-reading 50 vectors
    * per query and re-reading the table.
    */
  def pqRerankTopK(spark: SparkSession, sfDir: String, nQueries: Int = 20,
      k: Int = 5, shortlist: Int = 50): DataFrame = {
    val vecs = withScaled(Tables.embeddings(spark, sfDir))
    val q = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("svec").as("qvec"), col("norm2").as("qnorm2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    pqTopK(spark, sfDir, nQueries, shortlist)
      .select(col("query_id"), col("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .join(vecs.select(col("vec_id").as("neighbor_id"), col("svec"), col("norm2")),
        Seq("neighbor_id"))
      .withColumn("cosine", cosine(col("qvec"), col("svec"), col("qnorm2"), col("norm2")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rk").cast("long").as("rk"), col("cosine"))
  }

  def pqTopK(spark: SparkSession, sfDir: String, nQueries: Int = 20,
      k: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cosine").desc, col("vec_id").asc)
    pqCodes(spark, sfDir)
      .join(broadcast(pqLut(spark, sfDir, nQueries)), Seq("m", "code"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pdot")).as("adot"), sum(col("cnorm2")).as("anorm2"))
      .join(broadcast(pqQueryNorms(spark, sfDir, nQueries)), Seq("query_id"))
      .withColumn("approx_cosine",
        col("adot").cast("double") /
          (sqrt(col("qnorm2").cast("double")) * sqrt(col("anorm2").cast("double"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rk").cast("long").as("rk"), col("approx_cosine"))
  }

  /** Per-query ADC lookup tables (query_id, m, code, pdot, cnorm2) —
    * |queries|·PqM·PqK narrow rows, broadcast to wherever codes are scored.
    */
  private def pqLut(spark: SparkSession, sfDir: String, nQueries: Int): DataFrame =
    subvecs(spark, sfDir).filter(col("vec_id") < nQueries)
      .withColumnRenamed("vec_id", "query_id")
      .join(broadcast(pqCodebook(spark, sfDir)), Seq("m"))
      .select(col("query_id"), col("m"), col("cent_id").as("code"),
        idot(col("sub"), col("cvec")).as("pdot"),
        idot(col("cvec"), col("cvec")).as("cnorm2"))

  private def pqQueryNorms(spark: SparkSession, sfDir: String, nQueries: Int): DataFrame =
    Tables.embeddings(spark, sfDir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        idot(scaled(col("embedding")), scaled(col("embedding"))).as("qnorm2"))

  /** The COMPOSED index (q109) — IVF routing × PQ scoring × exact rerank,
    * the architecture a 100 TB vector store actually runs (FAISS's IVF-PQ):
    * the inverted lists bound WHICH candidates are touched (one cell here,
    * as in [[ivfTopK]]), the PQ codes bound the PER-CANDIDATE cost (PqM
    * lookups, no vector read), and the exact rerank of the short ADC
    * shortlist restores precision while hydrating only |queries|·shortlist
    * full vectors. Every stage is the already-oracle-checked operator, so
    * the composition is hash-gated end to end like q106/q107.
    */
  def ivfPqTopK(spark: SparkSession, sfDir: String, nCentroids: Int = 16,
      nQueries: Int = 20, k: Int = 3, shortlist: Int = 20): DataFrame = {
    val assigned = ivfAssigned(spark, sfDir, nCentroids)
    val cands = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("cell"))
      .join(assigned.select(col("vec_id"), col("cell")), Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"))
    val wShort = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_cosine").desc, col("vec_id").asc)
    val short = pqCodes(spark, sfDir)
      .join(cands, Seq("vec_id"))
      .join(broadcast(pqLut(spark, sfDir, nQueries)), Seq("query_id", "m", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pdot")).as("adot"), sum(col("cnorm2")).as("anorm2"))
      .join(broadcast(pqQueryNorms(spark, sfDir, nQueries)), Seq("query_id"))
      .withColumn("approx_cosine",
        col("adot").cast("double") /
          (sqrt(col("qnorm2").cast("double")) * sqrt(col("anorm2").cast("double"))))
      .withColumn("srk", row_number().over(wShort))
      .filter(col("srk") <= shortlist)
      .select(col("query_id"), col("vec_id").as("neighbor_id"))
    val full = withScaled(Tables.embeddings(spark, sfDir))
    val q = full.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("svec").as("qvec"), col("norm2").as("qnorm2"))
    val wFinal = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    short
      .join(broadcast(q), Seq("query_id"))
      .join(full.select(col("vec_id").as("neighbor_id"), col("svec"), col("norm2")),
        Seq("neighbor_id"))
      .withColumn("cosine", cosine(col("qvec"), col("svec"), col("qnorm2"), col("norm2")))
      .withColumn("rk", row_number().over(wFinal))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rk").cast("long").as("rk"), col("cosine"))
  }
}
