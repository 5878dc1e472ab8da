package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the Misra-Gries guarantees the oracle gate can't see (q87 runs with
  * k ≥ vocabulary, where the sketch is exact): under eviction pressure the
  * estimates never overcount, undercount by at most n/(k+1) regardless of
  * how Spark partitions the input (merge order), and every item with true
  * frequency above n/(k+1) survives in the summary.
  */
class HeavyHittersAggSpec extends SparkSpec {

  /** Skewed stream: items h0..h4 hot (1000, 500, 300, 200, 150 occurrences),
    * 200 rare items with 1..3 occurrences each — vocabulary 205 ≫ k.
    */
  private def skewed = {
    import spark.implicits._
    val hot = Seq("h0" -> 1000, "h1" -> 500, "h2" -> 300, "h3" -> 200, "h4" -> 150)
    val rare = (0 until 200).map(i => s"r$i" -> (i % 3 + 1))
    (hot ++ rare).flatMap { case (t, c) => Seq.fill(c)(t) }.toDF("term")
  }

  test("MG under eviction: no overcount, bounded undercount, hot items survive") {
    val exact = skewed.groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    for (k <- Seq(8, 32); parts <- Seq(1, 7)) {
      val bound = n / (k + 1)
      val est = skewed.repartition(parts)
        .agg(HeavyHittersAgg(col("term"), k).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.term"), col("e.est_count"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est.size <= k, s"k=$k parts=$parts: summary overflowed")
      est.foreach { case (t, c) =>
        assert(c <= exact(t), s"k=$k parts=$parts: $t overcounted $c > ${exact(t)}")
        assert(exact(t) - c <= bound,
          s"k=$k parts=$parts: $t undercount ${exact(t) - c} > $bound")
      }
      exact.filter(_._2 > bound).keys.foreach { t =>
        assert(est.contains(t), s"k=$k parts=$parts: heavy item $t evicted")
      }
    }
  }

  test("k ≥ vocabulary degenerates to exact counting across partitionings") {
    val exact = skewed.groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 7)) {
      val est = skewed.repartition(parts)
        .agg(HeavyHittersAgg(col("term"), 256).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.term"), col("e.est_count"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est == exact, s"parts=$parts: exact-mode sketch diverged")
    }
  }

  test("result is sorted by estimate desc then term asc; nulls are skipped") {
    import spark.implicits._
    val withNulls = Seq(Some("a"), None, Some("b"), Some("a"), None)
      .toDF("term")
    val arr = withNulls.agg(HeavyHittersAgg(col("term"), 8).as("hh"))
      .selectExpr("transform(hh, x -> x.term) AS ts", "transform(hh, x -> x.est_count) AS cs")
      .collect().head
    assert(arr.getSeq[String](0) == Seq("a", "b"))
    assert(arr.getSeq[Long](1) == Seq(2L, 1L))
  }

  test("terms past the 64 KiB modified-UTF-8 cap survive the shuffle round-trip") {
    import spark.implicits._
    // writeUTF would throw UTFDataFormatException here; the length-prefixed
    // encoding must round-trip through serialize/deserialize at the exchange
    val big = "x" * 70000 + "é" // multi-byte tail: byte length ≠ char length
    val df = (Seq.fill(5)(big) ++ Seq.fill(3)("small")).toDF("term")
    val est = df.repartition(4)
      .agg(HeavyHittersAgg(col("term"), 8).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.est_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map(big -> 5L, "small" -> 3L))
  }
}
