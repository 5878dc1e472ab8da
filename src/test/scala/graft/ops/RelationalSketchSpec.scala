package graft.ops

import graft.SparkSpec

/** The quantile sketch of q71: approx_percentile must land within the
  * Greenwald-Khanna rank-error bound of the exact percentile. With accuracy
  * a, rank error is n/a; translated to values we assert the approx value
  * falls between the exact percentiles at p ± 4/a.
  */
class RelationalSketchSpec extends SparkSpec {

  test("approx_percentile tracks exact percentiles within its rank bound") {
    val sf = "/root/testdata/sf0.01"
    val acc = 10000
    val eps = 4.0 / acc
    val li = graft.core.Tables.lineitem(spark, sf)
    for (p <- Seq(0.5, 0.95)) {
      val rows = li.groupBy("l_returnflag")
        .agg(
          org.apache.spark.sql.functions.expr(
            s"percentile(l_extendedprice, ${math.max(0.0, p - eps)})").as("lo"),
          org.apache.spark.sql.functions.expr(
            s"percentile(l_extendedprice, ${math.min(1.0, p + eps)})").as("hi"),
          org.apache.spark.sql.functions.expr(
            s"approx_percentile(l_extendedprice, $p, $acc)").as("approx"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val (lo, hi, ap) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
        assert(ap >= lo && ap <= hi,
          s"p=$p flag=${r.getString(0)}: approx=$ap outside [$lo, $hi]")
      }
    }
  }

  /** q165's oracle-gated form of the same contract: every (group, p) verdict
    * is true and the exact values match [[Statistics.quantileTable]]'s rows
    * for the same ps — the sketch swap's error budget, CI-enforced.
    */
  test("gkQuantileBound: every verdict true, exact values equal the quantile table") {
    val sf = "/root/testdata/sf0.01"
    val out = Statistics.gkQuantileBound(spark, sf).collect()
    assert(out.length == 6) // 3 flags × 2 ps
    assert(out.forall(_.getAs[Boolean]("within_bound")),
      "a sketch answer drifted outside floor((p-eps)n) <= rank <= ceil((p+eps)n)")
    val exact = Statistics.quantileTable(spark, sf, Seq(0.5, 0.95)).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    out.foreach { r =>
      assert(r.getDouble(2) == exact((r.getString(0), r.getDouble(1))))
    }
  }

  /** q237's rank-interval contract checked against INDEPENDENT ground truth:
    * the exact equi-depth populations (q170 — boundaries at the true order
    * statistics) must fall inside the sketch run's per-bin brackets, because
    * both boundary sets' ≤-ranks live within ±εn (+ the tie width M−1) of the
    * same ideal ranks. Also pins the bracket algebra: Σlo ≤ n ≤ Σhi.
    */
  test("equiDepthBinsSketch: brackets hold, contain the exact q170 populations") {
    val sf = "/root/testdata/sf0.01"
    val out = Statistics.equiDepthBinsSketch(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out.size === 10)
    assert(out.values.forall(_._3), "a sketch bin drifted outside its bracket")
    val n = graft.core.Tables.orders(spark, sf).count()
    assert(out.values.map(_._1).sum <= n && n <= out.values.map(_._2).sum,
      "bracket sums must straddle the row count")
    Statistics.equiDepthBins(spark, sf).collect().foreach { r =>
      val (bin, exactPop) = (r.getLong(0), r.getLong(1))
      val (lo, hi, _) = out(bin)
      assert(exactPop >= lo && exactPop <= hi,
        s"bin $bin: exact population $exactPop outside sketch bracket [$lo, $hi]")
    }
  }

  /** q238's contract against independent ground truth, same shape as the
    * q237 test: the EXACT winsorize clip counts (q150 — boundaries at the
    * true rank-⌈p·n⌉ order statistics) must fall inside q238's sketch-run
    * brackets, because the exact boundary's rank sits inside the same
    * [⌊(p−ε)n⌋, ⌈(p+ε)n⌉] interval the sketch is held to.
    */
  test("winsorizedPricingSketch: brackets hold, contain the exact q150 clip counts") {
    val sf = "/root/testdata/sf0.01"
    val out = Statistics.winsorizedPricingSketch(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getBoolean(7)))
      .toMap
    assert(out.size === 3)
    assert(out.values.forall(_._5), "a sketch clip count drifted outside its bracket")
    Statistics.winsorizedPricing(spark, sf).collect().foreach { r =>
      val flag = r.getString(0)
      val (exLo, exHi) = (r.getLong(2), r.getLong(3))
      val (loMin, loMax, hiMin, hiMax, _) = out(flag)
      assert(exLo >= loMin && exLo <= loMax,
        s"$flag: exact low clip $exLo outside [$loMin, $loMax]")
      assert(exHi >= hiMin && exHi <= hiMax,
        s"$flag: exact high clip $exHi outside [$hiMin, $hiMax]")
    }
  }
}
