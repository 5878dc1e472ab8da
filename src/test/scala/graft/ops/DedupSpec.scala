package graft.ops

import graft.SparkSpec

/** Near-dup pipeline invariants that the oracle can't see: the short-text
  * shingle guard (Spark's sequence() reverses when start > stop) and the
  * survivor choice in exact dedup.
  */
class DedupSpec extends SparkSpec {

  test("shingle guard: texts shorter than q yield empty gram sets, not fabricated grams") {
    import spark.implicits._
    val docs = Seq((1L, "ab"), (2L, "abcd"), (3L, ""))
      .toDF("doc_id", "text")
    val out = docs
      .select($"doc_id", DedupTestHook.shingles($"text", 3).as("grams"))
      .selectExpr("doc_id", "size(grams) AS n")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(out(1L) == 0) // "ab" shorter than 3 → empty, NOT [positions 1,0]
    assert(out(2L) == 2) // "abcd" → abc, bcd
    assert(out(3L) == 0)
  }

  test("exact dedup keeps the lowest doc_id as survivor and counts copies") {
    import spark.implicits._
    Seq((5L, "same text"), (2L, "same text"), (9L, "other"))
      .toDF("doc_id", "text").createOrReplaceTempView("documents_fixture")
    val out = spark.table("documents_fixture")
      .groupBy(org.apache.spark.sql.functions.md5(
        TextAnalysis.normText(org.apache.spark.sql.functions.col("text"))).as("fp"))
      .agg(
        org.apache.spark.sql.functions.min("doc_id").as("keep_id"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_copies"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((2L, 2L), (9L, 1L)))
  }

  test("short and null texts neither band-collide nor drop signature rows") {
    import spark.implicits._
    val d = tmpDir("dedupshort")
    // two sub-4-char docs + a null text + one normal pair of duplicates
    Seq(
      (1L, "ab", "en", 2), (2L, "xy", "en", 2), (3L, null.asInstanceOf[String], "en", 0),
      (4L, "identical content here for the real pair", "en", 40),
      (5L, "identical content here for the real pair", "en", 40))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    // every doc keeps its 16 signature rows (null minhash for 1,2,3)
    val sigCounts = Dedup.minhashSignatures(spark, d)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(sigCounts == Map(1L -> 16L, 2L -> 16L, 3L -> 16L, 4L -> 16L, 5L -> 16L))
    // but null signatures never band: only the real duplicate pair appears
    val pairs = Dedup.lshCandidatePairs(spark, d)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((4L, 5L)))
  }

  test("LSH candidate generation finds exact duplicates and the verify confirms them") {
    import spark.implicits._
    val d = tmpDir("deduptest")
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again", "en", 59),
      (2L, "the quick brown fox jumps over the lazy dog again and again", "en", 59),
      (3L, "completely different content with no overlap to speak of at all", "en", 63))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val pairs = Dedup.ngramJaccard(spark, d)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // identical docs found; unrelated doc not paired
  }

  test("containment: a quoted subset scores exactly 1 one-way, jaccard strictly less") {
    import spark.implicits._
    val d = tmpDir("containtest")
    // host extends the quote modestly: resemblance stays high enough for the
    // minhash bands to pair them (LSH is resemblance-tuned — a tiny quote
    // inside a huge host is the operator's documented recall caveat), while
    // the gram sets are strictly asymmetric
    val quote = "the quick brown fox jumps over the lazy dog again tonight for fun"
    val host = quote + " and one more tail"
    Seq((1L, quote, "en", quote.length), (2L, host, "en", host.length))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = Dedup.containmentPairs(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(rows.length === 1, "the pair must band together (near-identical)")
    val (_, _, nA, nB, nC, ca, cb, mx) = rows.head
    assert(nC === nA, "every gram of the quote appears in the host")
    assert(ca === 1.0, "containment of the quote in the host is exact 1")
    assert(cb < 1.0 && mx === ca, s"asymmetric: $ca vs $cb")
    // the symmetric jaccard is strictly below both containments' max
    assert(nC.toDouble / (nA + nB - nC) < mx)
  }

  test("containment: salted-join fallback returns exactly the broadcast-path rows") {
    import spark.implicits._
    val d = tmpDir("containsalt")
    val quote = "the quick brown fox jumps over the lazy dog again tonight for fun"
    val host = quote + " and one more tail"
    val other = "completely different content with no overlap to speak of at all right"
    Seq((1L, quote, "en", quote.length), (2L, host, "en", host.length),
        (3L, other, "en", other.length), (4L, other, "en", other.length))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    def rows(limit: Long) = Dedup.containmentPairs(spark, d, broadcastTextBytesLimit = limit)
      .orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))).toSeq
    val viaBroadcast = rows(Long.MaxValue)
    val viaSalt = rows(0L) // corpus "too big": force the shuffle fallback
    assert(viaBroadcast.nonEmpty)
    assert(viaSalt === viaBroadcast,
      "both text-attach paths must score identical pairs identically")
  }

  test("substring dedup finds a planted verbatim span and suppresses boilerplate windows") {
    import spark.implicits._
    val d = tmpDir("substringdedup")
    val span = "the exact forty-plus character quotation that both documents share verbatim"
    val boiler = "creative commons attribution license header boilerplate text repeated everywhere"
    // docs 1 and 2 share `span` at different offsets inside unrelated text;
    // docs 3-9 all carry ONLY the boilerplate line (df = 7 > maxDf = 5)
    val docs = Seq(
      (1L, s"completely unrelated preamble before $span and then a different tail", "en"),
      (2L, s"$span with its own continuation that shares nothing else at all here", "en"),
      // tails start with DISTINCT first characters: a window sliding one
      // char past the boilerplate must not match across any two docs
      (3L, s"$boiler alpha", "en"), (4L, s"$boiler beta", "en"),
      (5L, s"$boiler gamma", "en"), (6L, s"$boiler delta", "en"),
      (7L, s"$boiler epsilon", "en"), (8L, s"$boiler zeta", "en"),
      (9L, s"$boiler kappa", "en"),
      (10L, "short", "en")) // below the window length: no windows at all
      .map { case (id, t, l) => (id, t, l, t.length) }
    docs.toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val pairs = Dedup.substringDedup(spark, d, window = 40, maxDf = 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // the planted span (len 76 ≥ 40) yields shared windows for (1,2); the
    // boilerplate family pairs are suppressed by the df gate
    assert(pairs == Set((1L, 2L)),
      s"expected exactly the planted pair, got $pairs")
    // with the gate relaxed the boilerplate family IS pair-dense — the gate,
    // not luck, is what kept it out
    val ungated = Dedup.substringDedup(spark, d, window = 40, maxDf = 100)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(ungated.size == 1 + 21, // (1,2) + C(7,2) boilerplate pairs
      s"ungated should add all 21 boilerplate pairs, got ${ungated.size}")
  }
}

/** Test access to the package-private shingle builder. */
object DedupTestHook {
  def shingles(c: org.apache.spark.sql.Column, q: Int): org.apache.spark.sql.Column =
    graft.ops.Dedup.shingles(c, q)
}
