package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The incremental-refresh contract: merging prior artifacts with the dirty
  * slice must be EXACTLY equivalent to rebuilding from scratch — no lost
  * edge, no stale feature, no missed survivorship/representative/eval-set
  * flip. The DuckDB oracle (q101) pins refresh against an independent
  * engine; this spec pins it against the Spark from-scratch twin and checks
  * the refresh actually moved the manifest (it isn't V1's result re-served).
  */
class RefreshSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("refreshed manifest equals the from-scratch rebuild exactly") {
    val refreshed = Refresh.refreshedCorpus(spark, sf)
    val rebuilt = Refresh.rebuiltCorpus(spark, sf)
    assert(refreshed.count() > 0)
    assert(refreshed.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(refreshed).isEmpty)
  }

  test("incremental components equal the from-scratch labels for EVERY doc") {
    // the manifest only consumes representatives (id == component), so a bug
    // that mislabels non-representative members consistently could hide from
    // the equivalence test above — compare the full label map. The edge set
    // is the from-scratch one: incrementalComponents must reproduce scratch
    // labels for ANY V2 edge set (the contraction argument is edge-agnostic).
    val v2 = Refresh.docsV2(spark, sf)
    val feat = Refresh.docFeatures(v2)
    val edges = Refresh.edgesOver(feat, v2)
    val scratch = Graph.connectedComponents(
        v2.select(col("doc_id").as("id")),
        edges.select(col("doc_a").as("src"), col("doc_b").as("dst")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val gone = Corpus.corpusDiff(spark, sf)
      .filter(col("status").isin("changed", "removed")).select(col("doc_id"))
    val inc = Refresh.incrementalComponents(spark, sf, v2, edges, gone)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(inc.keySet === scratch.keySet, "every V2 doc labeled exactly once")
    assert(inc === scratch, "incremental labels diverge from from-scratch")
    // the contraction is real: at least one multi-member family exists, so
    // the test would catch a supernode that failed to expand
    assert(scratch.groupBy(_._2).exists(_._2.size > 1))
  }

  test("refresh responds to the diff: added docs can enter, removed docs leave") {
    val refreshed = Refresh.refreshedCorpus(spark, sf).select(col("doc_id"))
    val diff = Corpus.corpusDiff(spark, sf)
    // removed docs (in V1 only) must never appear in V2's manifest
    val removed = diff.filter(col("status") === "removed").select(col("doc_id"))
    assert(refreshed.join(removed, Seq("doc_id"), "left_semi").isEmpty)
    // V1-era docs dropped by the version filter differ from V2's manifest:
    // the refresh is not just re-serving the prior run's output
    val v1Ids = Refresh.docsV1(spark, sf).select(col("doc_id"))
    val added = refreshed.join(v1Ids, Seq("doc_id"), "left_anti")
    assert(added.count() > 0) // some doc_id % 7 == 0 doc made it in
  }
}
