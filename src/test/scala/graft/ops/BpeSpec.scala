package graft.ops

import graft.SparkSpec

/** Hand-traced BPE invariants: merge order by weighted pair frequency,
  * deterministic lexicographic tie-break, early exhaustion when no pairs
  * remain, and per-document subword counts under the learned merges.
  */
class BpeSpec extends SparkSpec {

  test("merges follow weighted pair counts and exhaust early") {
    import spark.implicits._
    val d = tmpDir("bpe")
    Seq(
      (1L, "ab ab ab", "en", 8L),
      (2L, "abc", "en", 3L))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    // round 1: (a,b) weight 4 beats (b,c) weight 1 → merge (a, b)
    // round 2: only (ab, c) remains → merge (ab, c)
    // round 3: no pairs anywhere → exhausted, k=3 yields 2 merges
    val merges = Bpe.bpeMerges(spark, d, k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toList
    assert(merges === List((1L, "a", "b"), (2L, "ab", "c")))

    val counts = Bpe.bpeTokenCounts(spark, d, k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(counts === Map(1L -> ((3L, 3L)), 2L -> ((1L, 1L))),
      "every word fully merged to a single subword token")
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
