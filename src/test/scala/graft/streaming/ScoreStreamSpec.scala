package graft.streaming

import graft.SparkSpec

/** Batch/stream parity for the threshold sweep (q242 vs q255): both sides
  * must produce the identical 9-row confusion table, because they share the
  * scoring expression tree and the sweep arithmetic by construction.
  */
class ScoreStreamSpec extends SparkSpec {

  test("streaming threshold sweep reproduces the batch sweep row for row") {
    val sf = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        Option(r.get(5)), Option(r.get(6)), Option(r.get(7)))
    val batch = graft.ops.Evaluation.thresholdMetrics(spark, sf)
      .orderBy("t").collect().map(key).toSeq
    val stream = ScoreStream.thresholdSweepAvailableNow(spark, sf)
      .orderBy("t").collect().map(key).toSeq
    assert(batch.length === 9)
    assert(stream === batch, "stream sweep diverged from batch")
  }

  test("streaming contamination monitor reproduces batch decontamination row for row") {
    val sf = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))
    val batch = graft.ops.Curation.decontaminate(spark, sf)
      .orderBy("doc_id").collect().map(key).toSeq
    val stream = ScoreStream.contaminationMonitorAvailableNow(spark, sf)
      .orderBy("doc_id").collect().map(key).toSeq
    assert(batch.nonEmpty && batch.exists(_._4),
      "fixture corpus must contain at least one contaminated doc")
    assert(stream === batch, "stream monitor diverged from batch decontamination")
  }

  test("streaming vocabulary-novelty monitor reproduces batch growth row for row") {
    // the SEVENTH batch/stream parity pair (q319 vs q330): both sides build
    // their (source, term, batch) cells from the same expression tree and
    // finish through the same growth arithmetic, so the series must be
    // identical — including the one IEEE division per row.
    val sf = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))
    val batch = graft.ops.TermStats.vocabularyGrowth(spark, sf)
      .orderBy("source", "batch").collect().map(key).toSeq
    val stream = ScoreStream.vocabGrowthAvailableNow(spark, sf)
      .orderBy("source", "batch").collect().map(key).toSeq
    assert(batch.nonEmpty && batch.exists(_._5 > 0),
      "fixture corpus must show new terms in some batch")
    assert(stream === batch, "stream growth series diverged from batch")
  }

  test("streaming per-source contamination reproduces the batch profile row for row") {
    // the NINTH batch/stream parity pair (q338 vs q340): per-doc verdicts
    // finalize in their arrival micro-batch (a doc's grams travel in its one
    // input row), the feed rollup is the SAME sourceContamRollup expression
    // tree — every count, token mass and rate division must match.
    val sf = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getLong(5))
    val batch = graft.ops.Curation.sourceContamination(spark, sf)
      .orderBy("source").collect().map(key).toSeq
    val stream = ScoreStream.sourceContamAvailableNow(spark, sf)
      .orderBy("source").collect().map(key).toSeq
    assert(batch.nonEmpty && batch.exists(_._2 > 0),
      "fixture corpus must contain at least one contaminated feed")
    assert(stream === batch, "stream feed profile diverged from batch")
  }

  test("streaming passage decontamination reproduces the batch verdicts row for row") {
    // the TENTH batch/stream parity pair (q331 vs q346): both sides build a
    // document's distinct (passage, gram) pairs from the SAME row-local
    // passagePairs expression tree, so every verdict row must match.
    val sf = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))
    val batch = graft.ops.Curation.passageDecontaminate(spark, sf)
      .orderBy("doc_id", "passage").collect().map(key).toSeq
    val stream = ScoreStream.passageDecontamAvailableNow(spark, sf)
      .orderBy("doc_id", "passage").collect().map(key).toSeq
    assert(batch.nonEmpty && batch.exists(_._5),
      "fixture corpus must contain at least one flagged passage")
    assert(stream === batch, "stream passage verdicts diverged from batch")
  }

  test("streaming burn monitor reproduces the batch burned-items table row for row") {
    // the ELEVENTH batch/stream parity pair (q349 vs q350), and the one
    // with the tightest state bound: leaked (eval_doc, gram) pairs only —
    // the SUITE's gram mass, never the corpus streaming past.
    val sf = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4))
    val batch = graft.ops.Curation.burnedEvalItems(spark, sf)
      .orderBy("doc_id").collect().map(key).toSeq
    val stream = ScoreStream.burnMonitorAvailableNow(spark, sf)
      .orderBy("doc_id").collect().map(key).toSeq
    assert(batch.nonEmpty && batch.exists(_._5),
      "fixture suite must contain at least one burned item")
    assert(stream === batch, "stream burn table diverged from batch")
  }

  test("streaming semantic-decontamination monitor reproduces the batch audit row for row") {
    // the TWELFTH batch/stream parity pair (q354 vs q355): the stream's
    // running max(struct(cosine, -vec_id)) encodes exactly the batch
    // window's ORDER BY cosine DESC, vec_id ASC tie-break, the cosine is
    // the same native integer-scaled expression on both sides, and the
    // finisher (semanticFlagsFromNN) is one shared function — so every
    // neighbor id, cosine double and verdict bit must match.
    val sf = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5))
    val batch = graft.ops.Similarity.semanticDecontam(spark, sf)
      .orderBy("doc_id").collect().map(key).toSeq
    val stream = ScoreStream.semanticDecontamAvailableNow(spark, sf)
      .orderBy("doc_id").collect().map(key).toSeq
    assert(batch.nonEmpty && batch.exists(_._6),
      "fixture corpus must contain at least one paraphrase leak")
    assert(stream === batch, "stream semantic audit diverged from batch")
  }

  test("streaming severity monitor reproduces the batch profile row for row") {
    // the THIRTEENTH batch/stream parity pair (q359 vs q367), and the first
    // STATELESS one: the stream emits spine + sparse hit rows through one
    // append-mode query (no state store), then the islands pass and the
    // 4-class rollup run batch-side through the SAME severityProfileRollup
    // expression tree — every class count, token mass, leaked-span total and
    // share division must match, the static spine included.
    val sf = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]))
    val batch = graft.ops.Curation.leakSeverityProfile(spark, sf)
      .orderBy("severity").collect().map(key).toSeq
    val stream = ScoreStream.severityProfileAvailableNow(spark, sf)
      .orderBy("severity").collect().map(key).toSeq
    assert(batch.length === 4, "static 4-class spine")
    assert(batch.exists(r => r._1 != "clean" && r._2 > 0),
      "fixture corpus must put at least one doc in a non-clean class")
    assert(stream === batch, "stream severity profile diverged from batch")
  }

  test("streaming widened savings reproduces the batch policy row") {
    // the FOURTEENTH batch/stream parity pair (q366 vs q371), stateless like
    // q367: the drained spine + hit positions feed the SAME widenedFromSpans
    // finisher verbatim, so every arm — including the interval-union
    // arithmetic and the one share division — must match exactly.
    val sf = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getDouble(8))
    val batch = graft.ops.Curation.widenedSavings(spark, sf)
      .collect().map(key).toSeq
    val stream = ScoreStream.widenedSavingsAvailableNow(spark, sf)
      .collect().map(key).toSeq
    assert(batch.length === 1 && batch.head._8 > 0L,
      "fixture must show a real widened-cut price")
    assert(stream === batch, "stream widened row diverged from batch")
  }

  test("streaming domain-mix monitor reproduces the batch solver row for row") {
    // the EIGHTH batch/stream parity pair (q332 vs q337): same cell
    // expression tree, same solver arithmetic over the drained census —
    // every share, weight, floor and feasibility bit must match.
    val sf = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getLong(7),
        r.getBoolean(8), r.getLong(9))
    val batch = graft.ops.TrainingMix.domainMix(spark, sf)
      .orderBy("source", "lang").collect().map(key).toSeq
    val stream = ScoreStream.domainMixAvailableNow(spark, sf)
      .orderBy("source", "lang").collect().map(key).toSeq
    assert(batch.length >= 2)
    assert(stream === batch, "stream mix solution diverged from batch")
  }
}
