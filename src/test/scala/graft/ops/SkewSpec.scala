package graft.ops

import graft.SparkSpec

/** Scale-technique proofs: salted joins produce exactly the plain-join result
  * while spreading hot keys, and bucketed tables co-locate their join with no
  * shuffle exchange on either side.
  */
class SkewSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("salted join ≡ plain join on a skewed key distribution") {
    import spark.implicits._
    // hot key: 9000 of 10010 rows share key 1
    val probe = ((1 to 9000).map(i => (1L, i)) ++ (1 to 1010).map(i => (i.toLong % 100 + 2, i)))
      .toDF("k", "v")
    val build = (1 to 120).map(i => (i.toLong, s"dim_$i")).toDF("bk", "name")
    val plain = probe.join(build, probe("k") === build("bk"))
    val salted = Skew.saltedJoin(probe, build, "k", "bk", nSalts = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the physical join really is keyed on (key, salt)
    val keys = salted.queryExecution.executedPlan.toString
    assert(keys.contains(Skew.SaltCol))
  }

  test("key-skew report ranks the hot key first with its load multiple") {
    import spark.implicits._
    // one hot key (1000 rows) among 100 cold keys (10 rows each): mean load
    // = 2000/101, so the hot key's skew_x is ~50× and every cold key ~0.5×
    val skewed = (Seq.fill(1000)(7L) ++ (1L to 100L).flatMap(k => Seq.fill(10)(k + 100)))
      .toDF("k")
    val rows = Skew.keySkewReport(skewed, "k", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.head._1 == 7L && rows.head._2 == 1000L)
    assert(rows.head._5 == 1000.0 * 101 / 2000)
    assert(rows.tail.forall(r => r._2 == 10L && r._5 == 10.0 * 101 / 2000))
    // deterministic tie order: cold keys ascend
    assert(rows.tail.map(_._1).toSeq == rows.tail.map(_._1).sorted.toSeq)
  }

  test("strategy policy flips on a crafted hot key and tracks every input") {
    // pure-function decision table: the crafted hot key (50× the mean load)
    // flips plain → aqe_skew/salted; a small build side trumps everything
    assert(Skew.chooseStrategy(1.7, 5000, 1000, 3.0, aqeEnabled = true) == "plain")
    assert(Skew.chooseStrategy(50.0, 5000, 1000, 3.0, aqeEnabled = true) == "aqe_skew")
    assert(Skew.chooseStrategy(50.0, 5000, 1000, 3.0, aqeEnabled = false) == "salted")
    assert(Skew.chooseStrategy(50.0, 900, 1000, 3.0, aqeEnabled = true) == "broadcast")
  }

  test("adaptive join: measured skew drives the decision; every branch joins identically") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // hot key 7 carries 1000 of 2000 rows over 101 keys → skew_x ≈ 50
    val skewed = (Seq.fill(1000)((7L, 1)) ++
      (1L to 100L).flatMap(k => Seq.fill(10)((k + 100, 2)))).toDF("k", "v")
    val uniform = (1L to 100L).flatMap(k => Seq.fill(10)((k, 3))).toDF("k", "v")
    val build = (1L to 300L).map(i => (i, s"d_$i")).toDF("bk", "name")
    val plainTwin = skewed.join(build, skewed("k") === build("bk"))

    // skewed probe, non-broadcastable build, AQE on → aqe_skew
    val (d1, j1) = Skew.adaptiveJoin(skewed, build, "k", "bk", broadcastRowLimit = 100)
    assert(d1 == "aqe_skew")
    assert(j1.exceptAll(plainTwin).isEmpty && plainTwin.exceptAll(j1).isEmpty)

    // same data, AQE off → salted; result still identical
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (d2, j2) = Skew.adaptiveJoin(skewed, build, "k", "bk", broadcastRowLimit = 100)
      assert(d2 == "salted")
      assert(j2.exceptAll(plainTwin).isEmpty && plainTwin.exceptAll(j2).isEmpty)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")

    // uniform probe → the decision flips back to plain
    val (d3, _) = Skew.adaptiveJoin(uniform, build, "k", "bk", broadcastRowLimit = 100)
    assert(d3 == "plain")

    // small build side short-circuits to broadcast regardless of skew
    val (d4, j4) = Skew.adaptiveJoin(skewed, build, "k", "bk", broadcastRowLimit = 1000)
    assert(d4 == "broadcast")
    assert(j4.exceptAll(plainTwin).isEmpty && plainTwin.exceptAll(j4).isEmpty)
  }

  test("bucketed tables join with zero shuffle exchanges (co-located)") {
    // drop catalog entries AND leftover physical locations from prior JVMs
    // (a fresh in-memory catalog doesn't know about on-disk leftovers)
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get(warehouse, t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.delete)
      }
    }
    graft.core.Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    graft.core.Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("b_lineitem").join(
        spark.table("b_orders"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange")) // bucket layout replaces both shuffles
      assert(joined.count() == Enrichish.factCount(spark, sf))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}

private object Enrichish {
  def factCount(spark: org.apache.spark.sql.SparkSession, sf: String): Long =
    graft.etl.Enrich.salesFact(spark, sf).count()
}
