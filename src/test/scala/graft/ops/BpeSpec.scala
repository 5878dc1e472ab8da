package graft.ops

import graft.SparkSpec

/** Hand-traced BPE invariants: merge order by weighted pair frequency,
  * deterministic lexicographic tie-break, the batched-round symbol-disjoint
  * conflict rule, early exhaustion when no pairs remain, and per-document
  * subword counts under the learned merges.
  */
class BpeSpec extends SparkSpec {

  test("batched rounds follow weighted pair counts, defer conflicts, exhaust early") {
    import spark.implicits._
    val d = tmpDir("bpe")
    Seq(
      (1L, "ab ab ab", "en", 8L),
      (2L, "abc", "en", 3L))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    // k=24 → 3 batched rounds (B=8):
    // round 1 candidates: (a,b) weight 4, (b,c) weight 1 — (b,c) shares
    //   symbol b with the higher-ranked (a,b), so the conflict filter
    //   DEFERS it; only (a,b) merges
    // round 2: only (ab, c) remains → merge (ab, c)
    // round 3: no pairs anywhere → exhausted, 2 merges total
    val merges = Bpe.bpeMerges(spark, d, k = 24)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toList
    assert(merges === List((1L, "a", "b"), (2L, "ab", "c")))

    val counts = Bpe.bpeTokenCounts(spark, d, k = 24)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(counts === Map(1L -> ((3L, 3L)), 2L -> ((1L, 1L))),
      "every word fully merged to a single subword token")

    // a single round (k=8) stops after the conflict-filtered batch: the
    // deferred (b,c)/(ab,c) merge never happens without its round
    val oneRound = Bpe.bpeMerges(spark, d, k = 8)
      .collect().map(r => (r.getString(1), r.getString(2))).toList
    assert(oneRound === List(("a", "b")))
  }

  test("apply-side dict join: over-budget shuffle fallback counts identically") {
    import spark.implicits._
    val d = tmpDir("bpefb")
    Seq((1L, "ab ab ab", "en", 8L), (2L, "abc", "en", 3L))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    def rows(limit: Long) = Bpe.bpeTokenCounts(spark, d, k = 24,
        dictBroadcastLimit = limit).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toList
    val expected = List((1L, 3L, 3L), (2L, 1L, 1L))
    assert(rows(Bpe.DictBroadcastLimit) === expected, "broadcast path")
    assert(rows(0L) === expected, "shuffle fallback — the budget is a pure performance choice")
  }

  test("equal-count pairs break ties lexicographically") {
    import spark.implicits._
    val d = tmpDir("bpetie")
    Seq((1L, "xy yx", "en", 5L))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val first = Bpe.bpeMerges(spark, d, k = 1)
      .collect().map(r => (r.getString(1), r.getString(2))).head
    assert(first === (("x", "y")), "(x,y) and (y,x) both weight 1; x\\ty sorts first")
  }
}
