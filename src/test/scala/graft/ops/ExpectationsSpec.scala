package graft.ops

import graft.SparkSpec

/** Invariants for the data-quality expectation reports. */
class ExpectationsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("referential audit: true edges pass, the misdeclared edge fails loudly") {
    val rows = Expectations.referentialAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.length === 9, "one row per declared edge")
    val (bad, good) = rows.partition(_._1.contains("misdeclared"))
    assert(good.forall(_._5), s"true edges must pass: ${good.filterNot(_._5).map(_._1)}")
    assert(good.forall(r => r._3 == 0L && r._4 == 0L))
    assert(bad.length === 1 && !bad.head._5, "misdeclared edge must fail")
    assert(bad.head._3 > 0 && bad.head._4 > 0 && bad.head._4 <= bad.head._3,
      "orphan keys bounded by orphan rows")
    // child cardinalities are the real table counts
    val li = graft.core.Tables.lineitem(spark, sf).count()
    assert(rows.filter(_._1.startsWith("lineitem.")).forall(_._2 == li))
  }

  test("gram novelty: sources partition the gram-bearing docs, ratios bounded") {
    val rows = Curation.gramNovelty(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, avg, fully) =>
      assert(nDocs > 0, src)
      assert(avg >= 0.0 && avg <= 1.0, s"$src avg $avg")
      assert(fully >= 0 && fully <= nDocs)
    }
    // every gram-bearing doc is counted exactly once across sources
    val nGramDocs = graft.core.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        Curation.wordGrams(org.apache.spark.sql.functions.col("text"), 3)).as("g"),
        org.apache.spark.sql.functions.col("doc_id"))
      .select("doc_id").distinct().count()
    assert(rows.map(_._2).sum === nGramDocs)
  }

  test("langid confusion: cells partition the corpus, shares sum to 1 per true lang") {
    val rows = TextAnalysis.langConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))
    val n = graft.core.Tables.documents(spark, sf).count()
    assert(rows.map(_._3).sum === n, "cells partition the documents")
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      assert(cells.map(_._3).sum === cells.head._4, s"$lang n_true consistent")
      assert(math.abs(cells.map(_._5).sum - 1.0) < 1e-12, s"$lang shares sum to 1")
    }
    rows.foreach(r => assert(r._6 === (r._1 == r._2)))
    // the stopword heuristic must beat 5-class chance on this tiny labeled
    // slice (the synthetic corpus's short docs cap its headroom here — the
    // confusion matrix itself is the deliverable, not the classifier)
    val acc = rows.filter(_._6).map(_._3).sum.toDouble / n
    assert(acc > 0.25, s"overall lang-id accuracy $acc")
  }
}
