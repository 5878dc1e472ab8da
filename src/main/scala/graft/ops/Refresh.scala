package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Incremental corpus refresh — the consumer of [[Corpus.corpusDiff]]: given
  * the previous run's stored artifacts and the V1→V2 diff, produce V2's
  * curated training manifest by re-running the TEXT-TOUCHING work only on the
  * changed/added slice and merging with the prior artifacts. The refreshed
  * manifest is oracle-gated to be EXACTLY the from-scratch
  * [[Corpus.curatedCorpus]] pipeline over V2 (q101) — refresh ≡ rebuild.
  *
  * Why this decomposition is sound: every expensive per-document derivation
  * (content fingerprint, token/quality stats, MinHash signature, word-gram
  * hash set) is a pure function of one document's text, and a verified
  * near-dup edge is a pure function of its two endpoints' texts (signatures →
  * shared band → exact Jaccard all depend only on the pair). So for a diff
  * with dirty = changed ∪ added and gone = changed ∪ removed:
  *
  *  - features(V2) = features(V1) \ gone  ∪  features(dirty)   — exact
  *  - edges(V2)    = edges(V1) minus edges incident to gone
  *                   ∪ edges incident to dirty                 — exact
  *
  * The remaining stages are narrow (hashes and ids only, no text) and rerun
  * globally, because their semantics are corpus-wide and CANNOT be patched
  * per-document: exact-dup survivorship is a window over fingerprint groups
  * (a removed survivor promotes the next copy), connected components is a
  * graph fixpoint (one new edge can merge two families and depose a
  * representative), and the decontamination gram set changes whenever an
  * eval-slice document changes (flipping hits for arbitrary other docs).
  * Merging the prior MANIFEST rows directly would silently miss all three.
  *
  * Scale shape at 100 TB: the prior run's features/edges are stored narrow
  * tables (here: the [[Dedup.cached]] materialize-once analogue, labels
  * `v1_features`/`v1_edges`); text is scanned only for the dirty slice plus
  * the candidate endpoints the new-edge verify hydrates — a semi-join-bounded
  * fraction of the corpus — while the global reruns shuffle two hashes and a
  * handful of longs per document. A 1% daily churn reprocesses ~1% of the
  * bytes, not 100%.
  */
object Refresh {

  /** The two corpus versions, derived deterministically from the one
    * `documents` table with the SAME scheme as [[Corpus.corpusDiff]] (which
    * this operator consumes — the derivations must not drift): V1 drops every
    * 7th document; V2 drops doc_id ≡ 3 (mod 11) and suffixes every 5th
    * document's text. `n_chars` is recomputed from the version's text so both
    * engines agree without assuming the metadata column tracks it.
    */
  private[ops] def docsV1(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(7)) =!= 0)
      .select(col("doc_id"), col("lang"), col("text"),
        length(col("text")).cast("long").as("n_chars"))

  private[ops] def docsV2(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(11)) =!= 3)
      .select(col("doc_id"), col("lang"),
        when(pmod(col("doc_id"), lit(5)) === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  /** The per-document feature row — everything downstream stages need, all of
    * it narrow, all of it a pure function of one document's text. This is the
    * ONLY place refresh touches text outside the new-edge verify.
    */
  private[ops] def docFeatures(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"), col("lang"), col("n_chars"),
      md5(TextAnalysis.normText(col("text"))).as("fingerprint"),
      TextAnalysis.qualityTokens.cast("long").as("n_tokens"),
      TextAnalysis.qualityScore.as("quality_score"),
      graft.functions.MinhashSigExpr(TextAnalysis.normText(col("text"))).as("sig"),
      Curation.wordGrams(col("text"), 5).as("wgrams"))

  /** LSH bands straight from a STORED signature array — the refresh path's
    * replacement for recomputing [[Dedup.minhashSignatures]]. Key layout
    * matches [[Dedup.lshCandidatePairs]] exactly (h_idx order within the
    * band, "|" separator). Signatures with any null entry (null/short text)
    * must not band at all — same guard, same reason: a collapsed empty band
    * key would pair every short doc with every other.
    */
  private def bandsFromSig(feat: DataFrame): DataFrame = {
    val bandKeys = (0 until Dedup.MinhashFuncs / Dedup.BandSize).map { b =>
      concat_ws("|", (0 until Dedup.BandSize).map(r =>
        col("sig").getItem(b * Dedup.BandSize + r).cast("string")): _*)
    }
    feat.filter(col("sig").isNotNull && !exists(col("sig"), _.isNull))
      .select(col("doc_id"), posexplode(array(bandKeys: _*)).as(Seq("band_idx", "band_key")))
  }

  /** Exact-Jaccard verify of candidate pairs against a docs frame — the
    * [[Dedup.ngramJaccardCompute]] verify stage over an arbitrary corpus
    * version. Hydrates normalized text for candidate endpoints only.
    */
  private def verifyPairs(cands: DataFrame, docs: DataFrame): DataFrame = {
    val d = docs.select(col("doc_id"), col("lang"), col("n_chars"),
      TextAnalysis.normText(col("text")).as("norm"))
    val a = d.select(col("doc_id").as("doc_a"), col("lang").as("lang_a"),
      col("n_chars").as("nc_a"), col("norm").as("norm_a"))
    val b = d.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
      col("n_chars").as("nc_b"), col("norm").as("norm_b"))
    cands.join(a, "doc_a").join(b, "doc_b")
      .filter(col("lang_a") === col("lang_b") &&
        abs(col("nc_a") - col("nc_b")) <= 20)
      .withColumn("jc", graft.functions.NgramJaccardExpr(col("norm_a"), col("norm_b"), 3))
      .filter(col("jc.jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
  }

  /** Full verified-edge build over one corpus version (band self-join +
    * verify) — used once, for the PRIOR version's stored artifact.
    */
  private[ops] def edgesOver(feat: DataFrame, docs: DataFrame): DataFrame = {
    val bands = bandsFromSig(feat)
    val cands = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyPairs(cands, docs)
  }

  // The previous run's stored outputs, materialized once per (session, sf) —
  // the in-JVM analogue of the feature/edge tables a production refresh reads
  // from storage. Without the memo every q101 run would rebuild V1's chain,
  // which is exactly the cost refresh exists to avoid.
  private val v1FeatCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private val v1EdgeCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  private val v1LabelCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def priorFeatures(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.cached(v1FeatCache, "v1_features", spark, sfDir)(
      docFeatures(docsV1(spark, sfDir)))

  private def priorEdges(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.cached(v1EdgeCache, "v1_edges", spark, sfDir)(
      edgesOver(priorFeatures(spark, sfDir), docsV1(spark, sfDir)))

  /** V1's component labels (id, component) — the third stored artifact a
    * production refresh reads beside features and edges (a dedup pipeline
    * that writes its edge table writes its label table in the same job).
    */
  private def priorLabels(spark: SparkSession, sfDir: String): DataFrame =
    Dedup.cached(v1LabelCache, "v1_labels", spark, sfDir)(
      Graph.connectedComponents(
        docsV1(spark, sfDir).select(col("doc_id").as("id")),
        priorEdges(spark, sfDir)
          .select(col("doc_a").as("src"), col("doc_b").as("dst"))))

  /** INCREMENTAL connected components for V2 from V1's stored labels — the
    * alternating-star fixpoint runs on a CONTRACTED graph instead of every
    * V2 edge (the r14 verdict's item 6):
    *
    *  - a V1 component none of whose members is gone is UNBREAKABLE by the
    *    diff (removal is the only operation that can split a component) and
    *    contracts to one supernode, whose id is its V1 label = its min
    *    member id (the min survives by definition of "no member gone");
    *  - components touched by `gone` may have split, so their surviving
    *    members re-enter as individual nodes alongside all added docs;
    *  - every V2 edge maps endpoint→representative: intra-unbroken edges
    *    become self-loops and vanish, so the fixpoint's input is exactly
    *    (new edges ∪ broken-component remnants) — at a 1% daily churn,
    *    ~1% of the edge volume.
    *
    * Exactness: a reduced-graph component's min node id equals the min
    * member id over everything it represents (each supernode id is already
    * its members' min; direct nodes are their own ids), so expanding
    * rep→component reproduces the from-scratch labels EXACTLY — RefreshSpec
    * equivalence-tests it against [[rebuiltCorpus]]'s full fixpoint and the
    * q101 oracle re-derives the whole manifest from scratch in SQL.
    */
  private[ops] def incrementalComponents(spark: SparkSession, sfDir: String,
      v2: DataFrame, v2Edges: DataFrame, gone: DataFrame): DataFrame = {
    val v1 = priorLabels(spark, sfDir)
    val broken = v1
      .join(gone.select(col("doc_id").as("id")), Seq("id"), "left_semi")
      .select(col("component")).distinct()
    val surviving = v1
      .join(gone.select(col("doc_id").as("id")), Seq("id"), "left_anti")
      .join(broken.withColumn("is_broken", lit(true)), Seq("component"), "left")
      .select(col("id").as("doc_id"),
        when(col("is_broken"), col("id")).otherwise(col("component")).as("rep"))
    val addedDocs = v2.select(col("doc_id"))
      .join(surviving.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("rep"))
    val repMap = surviving.unionByName(addedDocs)
    val mapped = v2Edges
      .join(repMap.select(col("doc_id").as("doc_a"), col("rep").as("src")), "doc_a")
      .join(repMap.select(col("doc_id").as("doc_b"), col("rep").as("dst")), "doc_b")
      .select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    val reduced = Graph.connectedComponents(
      repMap.select(col("rep").as("id")).distinct(), mapped)
    repMap
      .join(reduced.select(col("id").as("rep"), col("component")), "rep")
      .select(col("doc_id").as("id"), col("component"))
  }

  /** V2's curated training manifest by incremental refresh (see object doc).
    * Output schema matches [[Corpus.curatedCorpus]]: doc_id, lang, n_chars,
    * n_tokens, quality_score.
    */
  def refreshedCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val diff = Corpus.corpusDiff(spark, sfDir)
    val dirty = diff.filter(col("status").isin("changed", "added")).select(col("doc_id"))
    val gone = diff.filter(col("status").isin("changed", "removed")).select(col("doc_id"))
    val v2 = docsV2(spark, sfDir)

    // 1. per-doc features: reuse the prior artifact for unchanged docs,
    //    recompute text-derived features for the dirty slice ONLY
    val freshFeat = docFeatures(v2.join(dirty, Seq("doc_id"), "left_semi"))
    val keptFeat = priorFeatures(spark, sfDir).join(gone, Seq("doc_id"), "left_anti")
    val feat = keptFeat.unionByName(freshFeat)

    // 2. edges: prior edges lose every pair incident to a gone doc; fresh
    //    edges come from banding the dirty docs' signatures against ALL of
    //    V2's bands (dirty-incident candidates only — never a full self-join)
    val keptEdges = priorEdges(spark, sfDir)
      .join(gone.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_anti")
      .join(gone.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_anti")
    val newCands = bandsFromSig(freshFeat).as("a")
      .join(bandsFromSig(feat).as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
    // disjoint by construction: kept edges have two unchanged endpoints,
    // new edges at least one dirty one
    val edges = keptEdges.unionByName(verifyPairs(newCands, v2))

    // 3. labels: incremental — V1 components contract to supernodes, the
    //    fixpoint runs on new edges + broken-component remnants only
    manifest(feat, incrementalComponents(spark, sfDir, v2, edges, gone))
  }

  /** FROM-SCRATCH rebuild of V2's manifest through the same stages — the
    * executable spec [[refreshedCorpus]] is equivalence-tested against
    * (RefreshSpec): every feature, edge and label recomputed, no prior
    * artifacts.
    */
  private[graft] def rebuiltCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val v2 = docsV2(spark, sfDir)
    val feat = docFeatures(v2)
    val edges = edgesOver(feat, v2)
    manifest(feat, Graph.connectedComponents(
      v2.select(col("doc_id").as("id")),
      edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))))
  }

  /** The narrow global stages (no text): exact-dup survivor window over
    * fingerprints, representative selection off the component labels, and
    * the decontamination gram join over stored gram hashes — then the
    * three-way intersection. Corpus-wide semantics, so refresh reruns these
    * in full (labels arrive from either the incremental or the from-scratch
    * fixpoint — identical by the [[incrementalComponents]] argument).
    */
  private def manifest(feat: DataFrame, labels: DataFrame): DataFrame = {
    val byFingerprint = Window.partitionBy(col("fingerprint")).orderBy(col("doc_id"))
    val filtered = feat
      .withColumn("rn", row_number().over(byFingerprint))
      .filter(col("rn") === 1 &&
        col("n_chars").between(50, 100000) &&
        col("quality_score") >= 0.05)

    val reps = labels
      .filter(col("id") === col("component"))
      .select(col("id").as("doc_id"))

    val isEval = Corpus.hashBucket(col("doc_id"), "eval_v1") < 200
    val evalGrams = feat.filter(isEval)
      .select(explode(col("wgrams")).as("gram")).distinct()
      .withColumn("hit", lit(1L))
    val clean = feat.filter(!isEval)
      .select(col("doc_id"), explode_outer(col("wgrams")).as("gram"))
      .join(evalGrams, Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(coalesce(sum(col("hit")), lit(0L)).as("n_hits"))
      .filter(col("n_hits") === 0)
      .select(col("doc_id"))

    filtered
      .join(reps, Seq("doc_id"), "left_semi")
      .join(clean, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("n_tokens"), col("quality_score"))
  }
}
