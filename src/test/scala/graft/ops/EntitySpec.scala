package graft.ops

import graft.SparkSpec

/** Entity-resolution invariants the oracle gate can't isolate: fuzzy merge
  * within a block, transitive closure through a bridge name, and the
  * documented blocking boundary (a near-identical name in a DIFFERENT block
  * does not merge — recall is bounded by the blocking key by design).
  */
class EntitySpec extends SparkSpec {

  test("variants merge transitively within a block; blocking bounds recall") {
    import spark.implicits._
    val d = tmpDir("entity")
    Seq(
      (1L, "acme widget"),
      (2L, "acme widgit"),   // dist 1 from widget
      (3L, "acme widgits"),  // dist 1 from widgit, 2 from widget: bridge
      (4L, "acme anvil"),    // same block, far: stays alone
      (5L, "acmee widget"))  // different first token: never compared
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$d/part.parquet")

    val out = Entity.partEntities(spark, d)
      .collect().map(r => r.getString(1) -> ((r.getString(2), r.getBoolean(3)))).toMap

    assert(out.size === 5, "every part keeps a row")
    assert(out("acme widget") === (("acme widget", true)))
    assert(out("acme widgit") === (("acme widget", false)), "distance-1 variant merges")
    assert(out("acme widgits") === (("acme widget", false)), "transitive via the bridge")
    assert(out("acme anvil") === (("acme anvil", true)), "far name stays its own entity")
    assert(out("acmee widget") === (("acmee widget", true)),
      "cross-block variant is not merged: the blocking-key recall bound")
  }

  test("oversized-label degradation: shuffle join gives identical results, SortMergeJoin shape") {
    import spark.implicits._
    val d = tmpDir("entityshuffle")
    Seq(
      (1L, "acme widget"),
      (2L, "acme widgit"),
      (3L, "acme anvil"),
      (4L, "bolt large"))
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$d/part.parquet")

    val broadcastPlan = Entity.partEntities(spark, d)
    val shufflePlan = Entity.partEntities(spark, d, broadcastLabels = false)

    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3))
    assert(shufflePlan.collect().map(key).sortBy(_._1).toSeq ===
      broadcastPlan.collect().map(key).sortBy(_._1).toSeq,
      "degraded plan is result-identical to the broadcast plan")

    // The final label join must degrade to a non-broadcast join when the
    // label table is declared oversized. AQE may still pick SMJ or shuffled
    // hash; what must NOT appear for that join is a broadcast exchange on
    // the label side. Simplest robust pin: with the hint stripped and
    // autoBroadcast disabled, the physical plan carries a SortMergeJoin.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val physical = Entity.partEntities(spark, d, broadcastLabels = false)
        .queryExecution.executedPlan.toString
      assert(physical.contains("SortMergeJoin"),
        s"expected a SortMergeJoin in the degraded plan, got:\n$physical")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("multi-pass blocking recovers the cross-block variant single-pass misses") {
    import spark.implicits._
    val d = tmpDir("entitymp")
    Seq(
      (1L, "acme widget"),
      (2L, "acmee widget"), // first token differs (pass-1 blind), last matches
      (3L, "acme anvil"))
      .toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    val out = Entity.partEntitiesMultiPass(spark, d)
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(out("acmee widget") === "acme widget",
      "the last-token pass pairs what the first-token pass cannot")
    assert(out("acme anvil") === "acme anvil")
  }
}
