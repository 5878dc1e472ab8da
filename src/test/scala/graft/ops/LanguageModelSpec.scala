package graft.ops

import graft.SparkSpec

/** Hand-computed fixed-point bigram-LM scores on a corpus small enough to
  * verify every smoothed probability by hand, plus the short-document
  * contract (docs under 2 tokens surface with a zero count, not dropped).
  */
class LanguageModelSpec extends SparkSpec {

  test("bigram LM ppm scores match hand computation; short docs survive") {
    import spark.implicits._
    val d = tmpDir("lm")
    Seq(
      (1L, "a b a b", "en", 7L),
      (2L, "a b c", "en", 5L),
      (3L, "x", "en", 1L))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    // c12: "a b"=3, "b a"=1, "b c"=1; c1: a=3, b=2; V=4
    // ppm("a b") = 4000000 div 7 = 571428
    // ppm("b a") = ppm("b c") = 2000000 div 6 = 333333
    val rows = LanguageModel.bigramLmScores(spark, d)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getBoolean(4)))).toMap

    assert(rows(1L) === ((3L, 2L * 571428 + 333333, Some((2L * 571428 + 333333) / 3.0), false)))
    assert(rows(2L) === ((2L, 571428L + 333333, Some((571428L + 333333) / 2.0), true)))
    assert(rows(3L) === ((0L, 0L, None, false)))
  }

  test("DSIR weights point toward the target slice and keep short docs") {
    import spark.implicits._
    val d = tmpDir("dsir")
    Seq(
      (1L, "zebra stripe zebra stripe zebra stripe", "en", "src0", 38L),
      (2L, "zebra stripe pattern", "en", "src0", 20L),
      (3L, "common words common words common words common", "en", "src1", 45L),
      (4L, "zebra stripe common words", "en", "src1", 25L),
      (5L, "q", "en", "src1", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    val rows = LanguageModel.importanceWeights(spark, d)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap

    assert(rows.size === 5, "every document scores, including the short one")
    assert(rows(1L)._2 > 0 && rows(1L)._3, "pure target-vocab doc scores positive")
    assert(rows(3L)._2 < 0 && !rows(3L)._3, "pure raw-vocab doc scores negative")
    assert(rows(4L)._2 > rows(3L)._2, "mixed doc ranks above pure raw doc")
    assert(rows(5L) === ((0L, 0L, false)), "sub-bigram doc: zero features, zero weight")
  }
}
