package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Convergence and determinism of the k-means family ([[Similarity.kmeansStep]]
  * is the oracle-gated single round; [[Similarity.kmeans]] is its driver-side
  * fixpoint iteration, which SQL can't express — these pins replace the oracle
  * for the loop).
  */
class SimilaritySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("semantic decontam: NN recounted from exact cosines; flags compose q75's verdicts") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val rows = Similarity.semanticDecontam(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5)))).toMap
    // exact-cosine recount on the scaled integer vectors
    val vecs = Similarity.scaledVecs(spark, sf)
      .select("vec_id", "svec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val isEval = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"))
      .filter(Corpus.hashBucket(col("vec_id"), "eval_v1") < 200)
      .collect().map(_.getLong(0)).toSet
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val (ev, tr) = vecs.partition(v => isEval(v._1))
    assert(rows.keySet === ev.map(_._1).toSet, "one row per eval embedding")
    val verd = Curation.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    ev.foreach { case (id, qv) =>
      val best = tr.map { case (tid, tv) => (tid, cos(qv, tv)) }
        .minBy { case (tid, c) => (-c, tid) }
      val (nn, c, m, gf, pl) = rows(id)
      assert(nn === best._1 && c === best._2, s"eval $id nearest neighbor")
      assert(m === (c >= 0.4) && gf === verd(nn) && pl === (m && !gf), s"eval $id flags")
    }
    assert(rows.values.exists(_._3) && rows.values.exists(!_._3),
      "fixture must exercise both sides of the τ cut")
    assert(rows.values.exists(_._5), "fixture must show a paraphrase leak")
    assert(rows.values.exists(v => v._3 && v._4),
      "fixture must show a semantic match the gram check ALSO caught")
  }

  test("semantic decontam IVF arm: recounted from raw vectors; miss is one-sided") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val vecs = Similarity.scaledVecs(spark, sf)
      .select("vec_id", "svec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
    val isEval = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"))
      .filter(Corpus.hashBucket(col("vec_id"), "eval_v1") < 200)
      .collect().map(_.getLong(0)).toSet
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    def recount(nCentroids: Int): Map[Long, Option[(Long, Double)]] = {
      val cents = vecs.filter(_._1 < nCentroids)
      val cell = vecs.map { case (id, v) =>
        id -> cents.map { case (cid, cv) => (cid, cos(v, cv)) }
          .minBy { case (cid, c) => (-c, cid) }._1
      }.toMap
      val byCell = vecs.filterNot(v => isEval(v._1)).groupBy(v => cell(v._1))
      vecs.filter(v => isEval(v._1)).map { case (id, qv) =>
        id -> byCell.get(cell(id)).map(_.map { case (tid, tv) => (tid, cos(qv, tv)) }
          .minBy { case (tid, c) => (-c, tid) })
      }.toMap
    }
    // default geometry (16 cells): every eval cell holds training vectors
    val expected16 = recount(16)
    val rows = Similarity.semanticDecontamIvf(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet === expected16.keySet, "exact-arm spine preserved")
    rows.foreach { case (id, r) =>
      val Some((nn, c)) = expected16(id)
      assert(r.getLong(4) === nn && r.getDouble(5) === c, s"eval $id ivf NN")
      // the one-sided invariant: the exact arm maximizes over a superset
      assert(r.getDouble(5) <= r.getDouble(2), s"eval $id ivf_cosine > exact_cosine")
      assert(r.getBoolean(6) === (nn == r.getLong(1)), s"eval $id nn_recalled")
      assert(r.getBoolean(7) === ((c >= 0.4) == r.getBoolean(3)), s"eval $id verdict_agrees")
    }
    assert(rows.values.exists(_.getBoolean(6)) && rows.values.exists(!_.getBoolean(6)),
      "fixture must exercise recalled and missed neighbors")
    assert(rows.values.exists(!_.getBoolean(7)),
      "fixture must show at least one verdict the cheap arm gets wrong")
    // 64 cells: three eval items land in cells with NO training vector —
    // the empty-cell shape keeps its row with NULL ivf columns (q315 lesson)
    val expected64 = recount(64)
    val rows64 = Similarity.semanticDecontamIvf(spark, sf, nCentroids = 64)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(expected64.values.count(_.isEmpty) === 3, "probe geometry drifted")
    assert(rows64.keySet === expected64.keySet, "empty-cell rows must survive")
    rows64.foreach { case (id, r) =>
      expected64(id) match {
        case Some((nn, c)) =>
          assert(r.getLong(4) === nn && r.getDouble(5) === c, s"eval $id ivf NN @64")
        case None =>
          assert(r.isNullAt(4) && r.isNullAt(5), s"eval $id must have NULL ivf @64")
          assert(!r.getBoolean(6), s"eval $id nn_recalled must be false @64")
          assert(r.getBoolean(7) === !r.getBoolean(3), s"eval $id verdict @64")
      }
    }
  }

  test("semantic external: against-form fed the slice reproduces q354; suite path is external") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val vecs = graft.core.Tables.embeddings(spark, sf)
    // the identity the refactor pins: q354's hash-slice form is the
    // against-form fed the slice — NN id, cosine and τ-verdict all equal
    val isEval = Corpus.hashBucket(col("vec_id"), "eval_v1") < 200
    val viaAgainst = Similarity.semanticDecontamAgainst(
        vecs.filter(!isEval), vecs.filter(isEval)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val internal = Similarity.semanticDecontam(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(viaAgainst === internal, "slice-call ≡ against-form fed the slice")
    // the gated external query: suite and train sides genuinely partition
    val ext = Similarity.semanticDecontamExternal(spark, sf).collect()
    val buckets = vecs.select(col("vec_id"),
        Corpus.hashBucket(col("vec_id"), "suite_v2").as("b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ext.nonEmpty)
    ext.foreach { r =>
      assert(buckets(r.getLong(0)) < 50, "eval rows come from the suite slice")
      assert(buckets(r.getLong(1)) >= 50, "neighbors come from outside the suite")
      assert(r.getBoolean(3) === (r.getDouble(2) >= 0.4), "τ verdict")
    }
    assert(ext.map(_.getLong(0)).toSet === buckets.filter(_._2 < 50).keySet,
      "every suite item gets its NN row")
  }

  test("semantic leak by source: rollup recounted from q354's own verdicts") {
    val sf = "/root/testdata/sf0.001"
    val sem = Similarity.semanticDecontam(spark, sf).collect()
      .map(r => (r.getLong(1), r.getBoolean(3), r.getBoolean(5)))
    val srcOf = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val allSources = srcOf.values.toSet
    val rows = Similarity.semanticLeakBySource(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === allSources, "static source spine must be complete")
    allSources.foreach { s =>
      val hits = sem.filter(t => srcOf(t._1) == s)
      val r = rows(s)
      assert(r.getLong(1) === hits.map(_._1).distinct.length.toLong, s"$s n_nn_docs")
      assert(r.getLong(2) === hits.length.toLong, s"$s n_eval_hits")
      assert(r.getLong(3) === hits.count(_._2).toLong, s"$s matches")
      assert(r.getLong(4) === hits.count(_._3).toLong, s"$s leaks")
      if (hits.nonEmpty)
        assert(r.getDouble(5) === hits.count(_._3).toDouble / hits.length)
      else assert(r.isNullAt(5), s"$s zero-hit share must be NULL")
    }
    assert(rows.values.exists(_.getLong(4) > 0L),
      "fixture must show at least one feed carrying paraphrase leaks")
  }

  test("kmeans stopped after one iteration reproduces kmeansStep's reassignment") {
    val step = Similarity.kmeansStep(spark, sf)
      .select(col("vec_id"), col("cell1").as("cell"))
    val loop = Similarity.kmeans(spark, sf, maxIters = 1)
    assert(loop.count() > 0)
    assert(loop.exceptAll(step).isEmpty && step.exceptAll(loop).isEmpty)
  }

  test("kmeans yields a total deterministic partition into at most k cells") {
    val k = 8
    val n = graft.core.Tables.embeddings(spark, sf).count()
    val run1 = Similarity.kmeans(spark, sf, k = k, maxIters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // total: every vector assigned exactly once
    assert(run1.length.toLong == n && run1.map(_._1).distinct.length.toLong == n)
    // cells are seed ids, so the label space stays within [0, k)
    assert(run1.map(_._2).forall(c => c >= 0 && c < k))
    assert(run1.map(_._2).distinct.length > 1)
    // floored-mean centroids are bit-exact, so the whole loop is deterministic
    val run2 = Similarity.kmeans(spark, sf, k = k, maxIters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(run1.sorted.sameElements(run2.sorted))
  }

  test("int8 quantization: codes in [0,255], roundtrip error ≤ span/255 per dim") {
    val sf = "/root/testdata/sf0.001"
    val rows = Similarity.withQuantized(spark, sf)
      .select(col("vec_id"), col("svec"), col("qvec"), col("mns"), col("mxs"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sv = r.getSeq[Long](1); val qv = r.getSeq[Long](2)
      val mns = r.getSeq[Long](3); val mxs = r.getSeq[Long](4)
      assert(qv.forall(q => q >= 0 && q <= 255))
      sv.lazyZip(qv).lazyZip(mns.zip(mxs)).foreach { case (x, q, (mn, mx)) =>
        val span = mx - mn
        assert(x >= mn && x <= mx)
        val recon = if (span == 0) mn else mn + (q * span) / 255
        // dequantized value within one quantization step of the original
        assert(math.abs(recon - x) <= math.max(span / 255 + 1, 1),
          s"vec ${r.getLong(0)}: x=$x recon=$recon span=$span")
      }
    }
  }

  test("quantized ANN recall vs exact top-k stays high") {
    val sf = "/root/testdata/sf0.001"
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val exact = sets(Similarity.cosineTopK(spark, sf))
    val quant = sets(Similarity.quantizedTopK(spark, sf))
    assert(exact.keySet == quant.keySet)
    // keys.map on a Set would collapse equal per-query recalls — keep a Seq
    val recall = exact.keys.toSeq.map(q =>
      (exact(q) & quant(q)).size.toDouble / exact(q).size).sum / exact.size
    assert(recall >= 0.7, f"mean recall@5 over int8 codes = $recall%.2f")
  }

  test("ann recall query: per-query hits recomputed off its own two gated arms") {
    val sf = "/root/testdata/sf0.001"
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val exact = sets(Similarity.cosineTopK(spark, sf, 20, 3))
    val approx = sets(Similarity.annBucketTopK(spark, sf, 20, 3))
    val rows = Similarity.annRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSet === exact.keySet, "one row per query")
    rows.foreach { case (q, k, hits, recall) =>
      assert(k === 3L)
      val expected = (exact(q) & approx.getOrElse(q, Set.empty)).size.toLong
      assert(hits === expected, s"query $q hit count")
      assert(recall === hits.toDouble / 3.0)
      assert(recall >= 0.0 && recall <= 1.0)
    }
  }

  test("ivf nprobe curve: recall monotone in probes; nprobe=1 recounts q36's index") {
    val rows = Similarity.ivfRecallCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 4L, 8L))
    rows.foreach { case (_, k, nq, hits, recall) =>
      assert(k === 3L && nq === 20L && hits <= 60L)
      assert(recall === hits.toDouble / 60.0)
    }
    // widening the probe ring can only ADD candidates → hits non-decreasing
    assert(rows.map(_._4).toSeq === rows.map(_._4).sorted.toSeq, s"monotone: $rows")
    // nprobe = 1 IS q36's single-cell search: recount its hits directly
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (pairs(Similarity.ivfTopK(spark, sf)) &
      pairs(Similarity.cosineTopK(spark, sf, 20, 3))).size.toLong
    assert(rows.head._4 === expected, "nprobe=1 hits recount the gated q36 arm")
  }

  test("multi-probe recall: ring 1 dominates ring 0, which recounts q296's hits") {
    val rows = Similarity.multiProbeRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(0L, 1L))
    assert(rows(0)._2 <= rows(1)._2, "Hamming-1 probing can only add candidates")
    rows.foreach { case (_, hits, recall) => assert(recall === hits.toDouble / 60.0) }
    // ring 0 is exactly the q296 single-bucket search: its total hits match
    val q296 = Similarity.annRecall(spark, sf).collect().map(_.getLong(2)).sum
    assert(rows(0)._2 === q296, "ring-0 hits recount q296's per-query totals")
  }

  test("PQ codes are complete and bounded; ADC search recall vs exact stays useful") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    // every vector gets exactly PqM codes, each in [0, PqK)
    val codes = Similarity.pqCodes(spark, sf)
    val n = graft.core.Tables.embeddings(spark, sf).count()
    assert(codes.count() == n * Similarity.PqM)
    assert(codes.filter(col("code") < 0 || col("code") >= Similarity.PqK).isEmpty)
    assert(codes.groupBy(col("vec_id")).count().filter(col("count") =!= Similarity.PqM).isEmpty)
    // asymmetric-distance search against the exact top-k: PQ is the lossy
    // 32×-compression tier, so the bar is lower than int8's (64× fewer bits)
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val exact = sets(Similarity.cosineTopK(spark, sf))
    // pure ADC over 32-bit codes is the LOSSY tier — the floor documents
    // that, it does not promise quality (rerank below is the quality path)
    val adc = sets(Similarity.pqTopK(spark, sf))
    assert(exact.keySet == adc.keySet)
    val adcRecall = exact.keys.toSeq.map(q =>
      (exact(q) & adc(q)).size.toDouble / exact(q).size).sum / exact.size
    assert(adcRecall >= 0.15, f"mean ADC recall@5 = $adcRecall%.2f")
  }

  test("embedding dup clusters: pairs co-cluster, representatives are cluster minima") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val clusters = Similarity.embeddingDupClusters(spark, sf)
    val labels = clusters.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // total labelling: every vector appears exactly once
    assert(labels.size == graft.core.Tables.embeddings(spark, sf).count())
    // every verified near-dup pair lands in one family
    val pairs = Similarity.nearDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(labels(a)._1 == labels(b)._1, s"pair ($a,$b) split across clusters")
    }
    // the representative is the minimum id of its family, exactly one per cluster
    labels.groupBy(_._2._1).foreach { case (cid, members) =>
      assert(members.keys.min == cid)
      assert(members.count(_._2._2) == 1 && members(cid)._2)
    }
  }

  test("PQ shortlist + exact rerank restores recall at the larger scale") {
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    // sf0.01: 500 candidates, shortlist 50 = 10% of the corpus — the rerank
    // has to actually recover ranking quality, not enumerate everything
    val sf = "/root/testdata/sf0.01"
    val exact = sets(Similarity.cosineTopK(spark, sf))
    val reranked = sets(Similarity.pqRerankTopK(spark, sf))
    assert(exact.keySet == reranked.keySet)
    val recall = exact.keys.toSeq.map(q =>
      (exact(q) & reranked(q)).size.toDouble / exact(q).size).sum / exact.size
    assert(recall >= 0.6, f"mean reranked recall@5 = $recall%.2f")
  }

  test("hard negatives: one row per vector, labels honored, margin/violated consistent") {
    val labels = graft.core.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Similarity.hardNegatives(spark, sf).collect()
    assert(rows.length === labels.size, "exactly one row per vector")
    rows.foreach { r =>
      val (vid, lbl) = (r.getLong(0), r.getInt(1))
      assert(labels(vid) === lbl)
      if (!r.isNullAt(2)) {
        assert(labels(r.getLong(2)) === lbl, s"positive for $vid must share label")
        assert(r.getDouble(3) <= 1.0 + 1e-12)
      }
      if (!r.isNullAt(4))
        assert(labels(r.getLong(4)) !== lbl, s"negative for $vid must differ in label")
      if (!r.isNullAt(2) && !r.isNullAt(4)) {
        val (p, n) = (r.getDouble(3), r.getDouble(5))
        assert(r.getDouble(6) === p - n, "margin is pos - neg")
        assert(r.getBoolean(7) === (n > p), "violated iff negative closer")
      } else {
        assert(r.isNullAt(6) || r.isNullAt(7) || !r.getBoolean(7))
      }
    }
  }

  test("class separation: labels partition the corpus, margin identity holds") {
    val rows = Similarity.classSeparation(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))
    val n = graft.core.Tables.embeddings(spark, sf).count()
    assert(rows.map(_._2).sum === n, "every vector scored once")
    rows.foreach { case (lbl, nv, own, other, margin, mis) =>
      assert(own >= -1.0 - 1e-12 && own <= 1.0 + 1e-12, s"label $lbl own $own")
      assert(other >= -1.0 - 1e-12 && other <= 1.0 + 1e-12)
      // per-vec margins fold exactly, so the means obey the identity to
      // quantization error
      assert(math.abs(margin - (own - other)) < 1e-9, s"label $lbl margin identity")
      assert(mis >= 0 && mis <= nv)
    }
  }

  test("pca: unit vector, dominant eigenvalue positive, iteration converged") {
    val rows = Similarity.pcaPower(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.map(_._1).sorted.sameElements(0L to 63L), "one component per dim")
    val norm2 = rows.map(t => t._2 * t._2).sum
    assert(math.abs(norm2 - 1.0) < 1e-9, s"unit vector, |v|^2 = $norm2")
    val lambda = rows.head._3
    assert(rows.forall(_._3 == lambda), "lambda repeated on every row")
    assert(lambda > 0.0, "covariance top eigenvalue is positive")
    // guaranteed bound regardless of spectrum: 0 < λ ≤ trace(G)
    val vecs = Similarity.scaledVecs(spark, sf).collect()
      .map(_.getSeq[Long](1).toArray)
    val mu = (0 until 64).map(d =>
      math.floor(vecs.map(_(d)).sum.toDouble / vecs.length).toLong)
    val trace = vecs.map(v => (0 until 64).map { d =>
      val x = v(d) - mu(d); BigInt(x) * BigInt(x)
    }.sum).sum
    assert(lambda <= BigDecimal(trace).toDouble * (1 + 1e-9), "lambda <= trace")
    // convergence monitor (the residual check the scaladoc promises), run at
    // sf0.01 — the gate scale; this synthetic corpus's near-uniform spectrum
    // is the slow case, hence the 8-round default
    val sf01 = "/root/testdata/sf0.01"
    val v8 = Similarity.pcaPower(spark, sf01).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val v12 = Similarity.pcaPower(spark, sf01, rounds = 12).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dot = v8.keys.map(k => v8(k) * v12(k)).sum
    assert(math.abs(dot) > 0.98, s"round 8 aligned with round 12 at sf0.01, |cos|=$dot")
  }

  test("jl distortion: ratios concentrate near 1, exact distances recomputed for one pair") {
    val rows = Similarity.jlDistortion(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, d2o, d2p, ratio) =>
      assert(a < b && d2o > 0 && d2p >= 0)
      assert(ratio === (d2p / 16.0) / d2o.toDouble)
    }
    // JL with m=16: the mean ratio should sit near 1 (unbiased estimator)
    val mean = rows.map(_._5).sum / rows.length
    assert(mean > 0.5 && mean < 1.5, s"mean JL ratio $mean")
    // one pair recomputed exactly from raw embeddings
    val (qa, qb, d2o, _, _) = rows.head
    val vecs = graft.core.Tables.embeddings(spark, sf)
      .filter(col("vec_id") === qa || col("vec_id") === qb)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x * 1e8).toLong)).toMap
    val expect = vecs(qa).zip(vecs(qb)).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(d2o === expect, "exact int64 original distance")
  }

  test("silhouette: bounded, clusters partition the corpus, cells match kmeansStep") {
    val rows = Similarity.silhouette(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val total = graft.core.Tables.embeddings(spark, sf).count()
    assert(rows.map(_._2).sum === total, "clusters partition all vectors")
    rows.foreach { case (cell, n, mean, mn, mx, overall) =>
      assert(n > 0)
      assert(mn >= -1.0 && mx <= 1.0, s"cell $cell silhouette out of [-1,1]")
      assert(mean >= mn - 1e-12 && mean <= mx + 1e-12, s"cell $cell mean outside [min,max]")
      assert(overall === rows.head._6, "overall mean repeated")
    }
    // the q269 cell (argmax over the one-step centroids) must agree with
    // q77's cell1 assignment — same centroids, same argmax, same tiebreak
    val fromStep = Similarity.kmeansStep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val bySize = rows.map(r => (r._1, r._2)).toMap
    val stepSizes = fromStep.values.groupBy(identity).map { case (c, xs) => (c, xs.size.toLong) }
    assert(bySize === stepSizes, "per-cell populations match kmeansStep's cell1")
  }

  test("davies-bouldin: index is the mean of per-cluster worst ratios, all positive") {
    val rows = Similarity.daviesBouldin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (cell, n, sI, partner, ratio, db) =>
      assert(n > 0)
      assert(sI >= 0.0, s"cell $cell scatter negative")
      assert(ratio > 0.0, s"cell $cell worst ratio not positive")
      assert(partner != cell, "worst partner is another cluster")
      assert(db === rows.head._6, "db index repeated")
    }
    def q12(d: Double) = BigDecimal(d.toString).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val mean = rows.map(r => q12(r._5)).sum.toDouble / rows.length
    assert(math.abs(rows.head._6 - mean) < 1e-9 * mean, "index is the quantized-fold mean")
  }
}
