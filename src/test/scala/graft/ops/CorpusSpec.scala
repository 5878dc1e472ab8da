package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Edge cases of the corpus-curation ops that the sf datasets don't contain:
  * empty/short texts through the chunker, overlap determinism of the chunk
  * grid, redaction ordering, and split-fraction sanity.
  */
class CorpusSpec extends SparkSpec {

  test("chunking: empty text yields one empty chunk; short text one short chunk") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, "abc"), (3L, "x" * 500)).toDF("doc_id", "text")
    val chunks = Corpus.docChunksFrom(docs, width = 256, stride = 224)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    assert(chunks.toSeq == Seq(
      (1L, 0L, 1L, 0L),        // empty doc: one zero-length chunk
      (2L, 0L, 1L, 3L),        // sub-width doc: one short chunk
      (3L, 0L, 1L, 256L),      // 500 chars: full chunk at 1,
      (3L, 1L, 225L, 256L),    // full chunk at 225 (224 overlap window),
      (3L, 2L, 449L, 52L)))    // tail chunk of 52
  }

  test("adjacent chunks overlap by width - stride") {
    import spark.implicits._
    val text = (0 until 600).map(i => ('a' + i % 26).toChar).mkString
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val rows = Corpus.docChunksFrom(docs, width = 256, stride = 224)
      .orderBy("chunk_idx").collect()
    val starts = rows.map(_.getAs[Long]("start"))
    assert(starts.toSeq == Seq(1L, 225L, 449L))
    // consecutive chunks share exactly width - stride = 32 characters
    starts.sliding(2).foreach { case Array(a, b) => assert(b - a == 224) }
  }

  test("redaction replaces emails before their digit runs can be hit") {
    import spark.implicits._
    // staged via a scratch-free path: run the same expressions on a literal
    val df = Seq(("user1234567@example.com visits https://x.io/a?id=9999999 code 12345678"))
      .toDF("text")
    val out = df.select(
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), Corpus.EmailRe, "<EMAIL>"),
          Corpus.UrlRe, "<URL>"),
        Corpus.LongNumRe, "<NUM>").as("redacted"))
      .head().getString(0)
    assert(out == "<EMAIL> visits <URL> code <NUM>")
  }

  test("hash split fractions land near 90/5/5 and are disjoint + exhaustive") {
    val split = Corpus.hashSplit(spark, "/root/testdata/sf0.001")
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(total == 500)
    assert(counts("train") > 400 && counts("train") < 480)
    assert(counts.getOrElse("valid", 0L) + counts.getOrElse("test", 0L) == total - counts("train"))
    // determinism: the same salt reproduces the same assignment
    val again = Corpus.hashSplit(spark, "/root/testdata/sf0.001")
    assert(split.exceptAll(again).isEmpty)
  }

  test("corpus diff classifies added/removed/changed/unchanged by the version rules") {
    import spark.implicits._
    val d = tmpDir("diff")
    (1L to 40L).map(i => (i, s"text body $i", "en", 12))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = Corpus.corpusDiff(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = (1L to 40L).flatMap { i =>
      val inOld = i % 7 != 0
      val inNew = i % 11 != 3
      val changed = i % 5 == 0 // the " v2" suffix always changes the hash
      if (!inOld && !inNew) None
      else if (!inOld) Some(i -> "added")
      else if (!inNew) Some(i -> "removed")
      else Some(i -> (if (changed) "changed" else "unchanged"))
    }.toMap
    assert(out == expected)
    assert(Set("added", "removed", "changed", "unchanged").subsetOf(out.values.toSet))
  }

  test("quality sample keeps iff bucket clears the quality-scaled threshold") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val kept = Corpus.qualitySample(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getLong(3)))).toMap
    // membership must equal the per-row rule computed independently of the
    // operator's own filter (score and bucket recomputed from the corpus)
    val all = graft.core.Tables.documents(spark, sf)
      .select($"doc_id", TextAnalysis.qualityScore.as("q"),
        Corpus.hashBucket($"doc_id", "qsample_v1").as("b"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val expected = all.filter { case (_, q, b) =>
      b < math.min(1000L, math.floor(q * 3000.0).toLong)
    }.map(_._1).toSet
    assert(kept.keySet == expected)
    assert(kept.nonEmpty && kept.size < all.length) // sampling actually bites
    kept.values.foreach { case (q, b) =>
      assert(b < math.min(1000L, math.floor(q * 3000.0).toLong))
    }
  }

  test("source mix honors the per-shard budget and is deterministic") {
    val sf = "/root/testdata/sf0.001"
    val rows = Corpus.sourceMix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(5)))
    assert(rows.nonEmpty)
    // every admitted row is within its shard's share of the budget
    assert(rows.forall(_._5 <= 3000L))
    // cum_tokens is an internally consistent running sum per (source, shard)
    rows.groupBy(r => (r._2, r._4)).foreach { case (_, g) =>
      val sorted = g.sortBy(_._5)
      assert(sorted.map(_._3).sum == sorted.last._5)
    }
    val again = Corpus.sourceMix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(5)))
    assert(rows.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }
}
