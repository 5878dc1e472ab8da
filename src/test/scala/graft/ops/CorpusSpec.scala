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

  test("negative samples: draws recomputed from the hash; no emitted pair is a positive") {
    val sf = "/root/testdata/sf0.001"
    def hash8(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(8), 16)
    }
    val nParts = graft.core.Tables.part(spark, sf).count()
    val users = graft.core.Tables.customer(spark, sf)
      .select("c_custkey").collect().map(_.getLong(0))
    val pos = graft.core.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val positives = graft.core.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").collect()
      .flatMap(r => pos.get(r.getLong(0)).map(u => (u, r.getLong(1)))).toSet
    val expected = (for {
      u <- users; i <- 0 until 8
      item = hash8(s"$u:$i:neg_v1") % nParts
      if !positives((u, item))
    } yield (u, i.toLong, item)).toSet
    val rows = Corpus.negativeSamples(spark, sf)
      .select("user_id", "draw", "item").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows === expected, "exact draw-and-drop set")
    assert(rows.forall(r => r._3 >= 0 && r._3 < nParts), "items in range")
    assert(rows.forall(r => !positives((r._1, r._3))), "never a positive")
  }

  test("class weights: inverse-frequency identity; total weight is preserved") {
    val sf = "/root/testdata/sf0.001"
    val counts = graft.core.Tables.documents(spark, sf)
      .select("lang").collect().map(_.getString(0))
      .groupBy(x => x).map { case (l, xs) => (l, xs.length.toLong) }
    val n = counts.values.sum
    val k = counts.size.toLong
    val rows = Corpus.classWeights(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.map(_._1).toSet === counts.keySet)
    rows.foreach { case (l, nc, nt, kc, share, w) =>
      assert(nc === counts(l)); assert(nt === n); assert(kc === k)
      assert(share === nc.toDouble / n.toDouble)
      assert(w === n.toDouble / (k * nc).toDouble, s"$l weight")
    }
    // Σ n_c · w_c = N — reweighting preserves the total example mass
    val total = rows.map(r => r._2.toDouble * r._6).sum
    assert(math.abs(total - n.toDouble) < 1e-6 * n, "mass preserved")
  }
}
