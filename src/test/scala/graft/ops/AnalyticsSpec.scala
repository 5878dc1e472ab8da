package graft.ops

import graft.SparkSpec

/** Invariant checks for the statistical-analytics tier (the oracle gate pins
  * exact values; these pin the mathematical structure).
  */
class AnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("regression: corr bounded, slope/corr identity, groups partition the table") {
    val rows = Relational.priceQuantityRegression(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(4)))
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    assert(total === graft.core.Tables.lineitem(spark, sf).count())
    rows.foreach { case (flag, _, slope, corr) =>
      assert(corr >= -1.0 && corr <= 1.0, s"$flag corr out of range: $corr")
      // slope and corr must share their sign (same covariance numerator)
      assert(slope.sign === corr.sign || slope == 0.0, s"$flag sign mismatch")
    }
  }

  test("histogram: cumulative counts are monotone, end at the total, share ends at 1") {
    val rows = Relational.priceHistogram(spark, sf)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum === rows.last._3, "last cum_n is the total")
    assert(rows.sliding(2).forall { case Array(a, b) => b._3 > a._3; case _ => true })
    assert(math.abs(rows.last._4 - 1.0) < 1e-12, "cumulative share ends at 1")
    assert(rows.last._3 === graft.core.Tables.lineitem(spark, sf).count())
  }

  test("pagerank: probability mass conserved, all ranks positive") {
    val rows = Graph.pageRank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 > 0.0))
    // symmetric co-purchase graph has no dangling mass: Σrank = 1
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-9)
    assert(rows.forall(_._3 > 0), "every ranked node has out-edges by construction")
  }

  test("kmeans: every vector assigned once, to a seed-derived cluster, dist >= 0") {
    val rows = Clustering.kmeansAssignments(spark, sf, k = 4, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val n = graft.core.Tables.embeddings(spark, sf).count()
    assert(rows.length.toLong === n, "exactly one assignment per vector")
    assert(rows.map(_._1).distinct.length.toLong === n)
    assert(rows.forall(_._2 < 4), "cluster ids come from the k seeds")
    assert(rows.forall(_._3 >= 0.0))
  }

  test("winsorize: cut order sane, clip fractions near their percentiles") {
    val rows = Statistics.winsorizedPricing(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (flag, n, lo, hi, pLo, pHi) =>
      assert(pLo < pHi, s"$flag cut order")
      assert(lo < n * 0.06 && hi < n * 0.06, s"$flag clips ~5% per side")
      assert(lo > 0 && hi > 0, s"$flag actually clips something")
    }
  }

  test("chi-square: non-negative statistic, dof from the table dimensions") {
    val r = Statistics.chiSquareFlagStatus(spark, sf).head
    assert(r.getDouble(0) >= 0.0)
    assert(r.getLong(1) === 2L, "(3 flags - 1) x (2 statuses - 1)")
  }

  test("bm25: positive scores, matched-term counts bounded by the query") {
    val rows = TermStats.bm25Scores(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._2 > 0.0 && r._3 >= 1L && r._3 <= 3L))
  }

  test("entropy: within [0, ln(vocab)] per source") {
    val rows = TermStats.tokenEntropyBySource(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, vocab, h) =>
      assert(h >= 0.0 && h <= math.log(vocab.toDouble) + 1e-9, s"$src entropy $h vocab $vocab")
    }
  }

  test("array HOFs agree with the explode-based recompute") {
    import org.apache.spark.sql.functions._
    val out = TermStats.arrayFunctionShowcase(spark, sf)
    val viaExplode = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("t"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens2"), sum(length(col("t"))).as("total_chars2"))
    val joined = out.join(viaExplode, "doc_id")
    assert(joined.filter(col("n_tokens") =!= col("n_tokens2")
      || col("total_chars") =!= col("total_chars2")).isEmpty)
    assert(out.filter(col("head3").isNull || length(col("head3")) === 0).isEmpty)
  }

  test("PSI: non-negative total, cohorts partition the table") {
    val r = Statistics.priceDriftPsi(spark, sf).head
    assert(r.getDouble(0) >= 0.0, "every (p-q)ln(p/q) term is non-negative")
    assert(r.getLong(2) + r.getLong(3) === graft.core.Tables.lineitem(spark, sf).count())
  }

  test("quantile table: monotone across p within each group, bracketed by winsorize cuts") {
    val rows = Statistics.quantileTable(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (flag, g) =>
      val byP = g.sortBy(_._2).map(_._3)
      assert(byP.zip(byP.tail).forall { case (a, b) => a <= b }, s"$flag monotone")
      assert(byP.length === 5, s"$flag one value per requested p")
    }
  }

  test("null-safe join routes NULL keys instead of dropping them") {
    import org.apache.spark.sql.functions._
    val rows = Relational.nullSafeJoinCounts(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val orders = graft.core.Tables.orders(spark, sf)
    val pCount = orders.filter(col("o_orderstatus") === "P").count()
    assert(rows("UNKNOWN") === pCount, "every NULL-keyed row resolved to the NULL dim row")
    assert(rows.values.sum === orders.count(), "no row dropped")
  }

  test("hybrid search: RRF bounds, arm coverage, two-arm docs outrank their single-arm ranks") {
    val rows = TermStats.hybridSearch(spark, sf).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    // every doc came from at least one arm; RRF within (0, 2/61]
    rows.foreach { case (id, rl, rs, rrf) =>
      assert(rl.isDefined || rs.isDefined, s"doc $id in neither arm")
      assert(rrf > 0.0 && rrf <= 2.0 / 61.0, s"doc $id rrf $rrf out of range")
    }
    // a doc in BOTH arms scores strictly above the same ranks in one arm
    rows.filter(r => r._2.isDefined && r._3.isDefined).foreach { case (_, rl, rs, rrf) =>
      assert(rrf > 1.0 / (60.0 + rl.get) && rrf > 1.0 / (60.0 + rs.get))
    }
  }

  test("triangles: degree-oriented count equals the naive id-ordered recompute") {
    import org.apache.spark.sql.functions._
    val r = Graph.triangleStats(spark, sf).head
    val li = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct().cache()
    val naive = e.as("e1").join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
      .count()
    assert(r.getAs[Long]("n_triangles") === naive)
    assert(r.getAs[Long]("n_edges") === e.count())
    assert(r.getAs[Long]("n_wedges") >= r.getAs[Long]("n_triangles") * 3,
      "every triangle closes three wedges")
    // the over-budget fallback (closure NOT broadcast — shuffle equi-join)
    // counts identically: the broadcast gate is a pure performance choice
    val deg = e.select(col("u").as("id")).union(e.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val shuffled = Graph.triangleCensus(e, deg, broadcastEdgeLimit = 0L).head
    assert(shuffled.getAs[Long]("n_triangles") === naive)
    e.unpersist()
  }

  test("basket pairs: counts match a naive recompute; confidence and lift consistent") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Market.basketPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    val li = graft.core.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val nOrders = li.select("ok").distinct().count()
    val itemN = li.groupBy("pk").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (a, b, both, na, nb, n) = (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      assert(both >= 3 && a < b && n === nOrders)
      assert(na === itemN(a) && nb === itemN(b))
      assert(r.getDouble(6) === both.toDouble / na)                  // confidence
      assert(r.getDouble(7) === (both * n).toDouble / (na * nb))     // lift
      assert(both <= math.min(na, nb), "support bounded by both margins")
    }
  }

  test("class balance: every language ends at exactly the minority count") {
    import org.apache.spark.sql.functions._
    val rows = Corpus.classBalance(spark, sf).collect()
    val perLang = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val docs = graft.core.Tables.documents(spark, sf)
    val trueMin = docs.groupBy("lang").count().agg(min("count")).head.getLong(0)
    assert(perLang.values.toSet === Set(trueMin.toInt),
      s"unbalanced: $perLang (target $trueMin)")
    assert(perLang.keySet === docs.select("lang").distinct().collect()
      .map(_.getString(0)).toSet, "no language dropped")
  }

  test("weighted sample: k rows, keys descending, deterministic across reruns") {
    val a = Corpus.weightedSample(spark, sf, k = 50).collect()
    assert(a.length === 50)
    val keys = a.map(_.getDouble(3))
    assert(keys.zip(keys.tail).forall { case (x, y) => x >= y }, "ES keys descending")
    val b = Corpus.weightedSample(spark, sf, k = 50).collect()
    assert(a.map(_.getLong(0)).toSeq === b.map(_.getLong(0)).toSeq,
      "content-addressed draw is rerun-stable")
  }

  test("stratified weighted sample: exact per-stratum top-k of the full key set") {
    val k = 5
    val picked = Corpus.stratifiedWeightedSample(spark, sf, k = k).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getDouble(3)))
    assert(picked.nonEmpty)
    // the full keyed population: k larger than any stratum keeps everything
    val all = Corpus.stratifiedWeightedSample(spark, sf, k = Int.MaxValue).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getDouble(3)))
    val expect = all.groupBy(_._1).map { case (lang, g) =>
      lang -> g.sortBy(x => (-x._3, x._2)).take(k).map(_._2).toSet
    }
    val got = picked.groupBy(_._1).map { case (lang, g) => lang -> g.map(_._2).toSet }
    assert(got.keySet === expect.keySet, "every stratum represented")
    got.foreach { case (lang, ids) =>
      assert(ids === expect(lang), s"$lang: not the exact ES top-$k")
      assert(ids.size === math.min(k, all.count(_._1 == lang)), lang)
    }
  }

  test("MAD outliers: groups partition the table, outliers strictly beyond the cut") {
    import org.apache.spark.sql.functions._
    val rows = Statistics.madOutliers(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._2).sum === graft.core.Tables.events(spark, sf).count())
    rows.foreach { case (g, n, outl, med, mad) =>
      assert(med > 0 && mad > 0, s"$g degenerate median/MAD")
      assert(outl < n, s"$g everything an outlier")
      // recompute one group's census directly
      val direct = graft.core.Tables.events(spark, sf)
        .filter(col("event_type") === g)
        .filter(abs(col("value") - med) > 3.0 * mad).count()
      assert(outl === direct, s"$g outlier count mismatch")
    }
  }

  test("BFS: hop 0 is the seed set, every reached node counted once") {
    import org.apache.spark.sql.functions._
    val rows = Graph.bfsHops(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val li = graft.core.Tables.lineitem(spark, sf)
    val nodes = li.select(col("l_partkey")).distinct()
    val seeds = nodes.filter(col("l_partkey") % 500 === 0).count()
    assert(rows(0L) === seeds, "hop 0 = seeds present in the graph")
    assert(rows.keys.max <= 3L)
    assert(rows.values.sum <= nodes.count(), "no node reached twice")
  }

  test("RFM: scores in 1..4, quartile populations near-equal per dimension") {
    val rows = graft.ops.Market.rfmSegments(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5), r.getLong(6)))
    val n = rows.length
    assert(n === graft.core.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count())
    Seq[(String, Array[Long])](
      ("r", rows.map(_._2)), ("f", rows.map(_._3)), ("m", rows.map(_._4))
    ).foreach { case (dim, scores) =>
      assert(scores.forall(s => s >= 1 && s <= 4), s"$dim score out of range")
      // value ties (freq is small-int) can lump quartiles; monetary/recency
      // are near-unique so their quartiles stay within a loose band
      if (dim != "f") scores.groupBy(identity).values.foreach(g =>
        assert(math.abs(g.length - n / 4.0) <= n / 8.0, s"$dim quartile skew"))
    }
  }

  test("inverted index: df matches a direct recompute, postings capped at 5") {
    import org.apache.spark.sql.functions._
    val rows = TermStats.invertedIndex(spark, sf, minDf = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    val df = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("t"))
      .distinct().groupBy("t").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (term, d, postings) =>
      assert(d >= 10 && d === df(term), s"$term df")
      val ids = postings.split(",")
      assert(ids.length === math.min(5L, d).toInt, s"$term postings length")
      assert(ids.distinct.length === ids.length, s"$term duplicate postings")
    }
  }

  test("skyline: members dominate every non-member, no member dominates another") {
    import org.apache.spark.sql.functions._
    val sky = Relational.orderSkyline(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDate(1), r.getDouble(2)))
    assert(sky.nonEmpty)
    // no member dominates another (date <=, price >=, one strict)
    for (a <- sky; b <- sky if a._1 != b._1)
      assert(!(!a._2.after(b._2) && a._3 >= b._3 &&
        (a._2.before(b._2) || a._3 > b._3)), s"$a dominates member $b")
    // every non-member is dominated by some member
    val all = graft.core.Tables.orders(spark, sf)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").as("price")).collect()
      .map(r => (r.getLong(0), r.getDate(1), r.getDouble(2)))
    val skyIds = sky.map(_._1).toSet
    all.filterNot(r => skyIds.contains(r._1)).foreach { r =>
      assert(sky.exists(s => !s._2.after(r._2) && s._3 >= r._3 &&
        (s._2.before(r._2) || s._3 > r._3)), s"non-member $r undominated")
    }
  }

  test("embedding dim stats: one row per dimension, every vector counted, min<=mean<=max") {
    val rows = graft.ops.Stats.embeddingDimStats(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    val nVecs = graft.core.Tables.embeddings(spark, sf).count()
    assert(rows.nonEmpty && rows.map(_._1).distinct.length === rows.length)
    rows.foreach { case (dim, n, mn, mx, mean) =>
      assert(n === nVecs, s"dim $dim missing vectors")
      assert(mn <= mean + 1e-9 && mean <= mx + 1e-9, s"dim $dim mean outside [min,max]")
    }
  }

  test("term PMI: one pair recomputed directly; counts bounded by margins") {
    import org.apache.spark.sql.functions._
    val rows = TermStats.termPmi(spark, sf, minDf = 10, minPair = 5).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val nDocs = graft.core.Tables.documents(spark, sf).count()
    rows.foreach { case (a, b, nab, dfa, dfb, pmi) =>
      assert(a < b && nab <= math.min(dfa, dfb))
      val expected = BigDecimal(math.log(nab.toDouble * nDocs / (dfa * dfb)))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(pmi === expected, s"($a,$b) pmi")
    }
    // spot-recompute one pair's co-count straight from the corpus
    val (a, b, nab, _, _, _) = rows.head
    val direct = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("t"))
      .distinct()
      .groupBy("doc_id")
      .agg(max(when(col("t") === a, 1)).as("ha"), max(when(col("t") === b, 1)).as("hb"))
      .filter(col("ha") === 1 && col("hb") === 1).count()
    assert(direct === nab)
  }

  test("global rank: the two-phase plan reproduces the declarative window exactly") {
    import org.apache.spark.sql.functions._
    val phased = Relational.globalPriceRank(spark, sf)
    val declarative = graft.core.Tables.orders(spark, sf)
      .select(col("o_orderkey").as("id"), col("o_totalprice").as("price"))
      .withColumn("global_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("price"), col("id"))).cast("long"))
    assert(phased.exceptAll(declarative).isEmpty &&
      declarative.exceptAll(phased).isEmpty)
    // the data-sized window is partitioned by bucket — the single-task
    // global sort exists only in the declarative twin above
    val p = phased.queryExecution.executedPlan.toString
    assert(p.contains("row_number") && p.contains("bucket"))
  }

  test("log-odds terms: top-k per source, deltas ordered, counts bounded by source totals") {
    import org.apache.spark.sql.functions._
    val rows = TermStats.logOddsTerms(spark, sf, minDf = 10).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, g) =>
      assert(g.map(_._5).sorted.toSeq === (1L to g.length), s"$src ranks")
      val byRank = g.sortBy(_._5).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, s"$src delta order")
    }
    val srcTotals = graft.core.Tables.documents(spark, sf)
      .select(col("source"), explode(regexp_extract_all(lower(col("text")),
        lit("[a-z0-9]+"), lit(0))).as("t"))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (src, _, cs, _, _) => assert(cs <= srcTotals(src)) }
  }

  test("zipf: slope negative and in the natural-text band for every language") {
    val rows = TermStats.zipfSlope(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, n, slope) =>
      assert(n > 10, s"$lang too few rank points")
      assert(slope < 0.0 && slope > -3.0, s"$lang slope $slope out of band")
    }
  }

  test("quantile-boundary rank: equals the declarative window AND balances a skewed distribution") {
    import org.apache.spark.sql.functions._
    val phased = Relational.globalPriceRankQuantile(spark, sf, nBuckets = 8)
    val declarative = graft.core.Tables.orders(spark, sf)
      .select(col("o_orderkey").as("id"), col("o_totalprice").as("price"))
      .withColumn("global_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("price"), col("id"))).cast("long"))
    assert(phased.exceptAll(declarative).isEmpty &&
      declarative.exceptAll(phased).isEmpty)
    // the property the quantile policy buys: on a SKEWED value distribution
    // (price², clumping mass at the low end) the quantile buckets stay
    // near-equal where a uniform value grid would overload the first ones
    val skewed = graft.core.Tables.orders(spark, sf)
      .select(col("o_orderkey").as("id"),
        (col("o_totalprice") * col("o_totalprice")).as("price"))
    val n = skewed.count()
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("price"))
    val bounds = skewed.select(col("price"))
      .withColumn("rn", row_number().over(w))
      .withColumn("nn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("price"), col("rn"), col("nn"),
        explode(array((1 until 8).map(lit): _*)).as("i"))
      .filter(col("rn") === ceil(col("i").cast("double") * col("nn") / 8))
      .agg(sort_array(collect_list(col("price"))).as("bs"))
    val sizes = skewed.crossJoin(broadcast(bounds))
      .withColumn("bucket", size(filter(col("bs"), b => b < col("price"))))
      .groupBy("bucket").count().collect().map(_.getLong(1))
    sizes.foreach(s => assert(math.abs(s - n / 8.0) <= n / 16.0,
      s"quantile bucket holds $s of $n — not balanced"))
  }

  test("equi-depth bins: populations near-equal, ranges disjoint and ordered") {
    import org.apache.spark.sql.functions._
    val rows = Statistics.equiDepthBins(spark, sf).collect()
      .sortBy(_.getAs[Long]("bin"))
    assert(rows.map(_.getAs[Long]("bin")).toSeq === (1L to 10L))
    val n = graft.core.Tables.orders(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum === n)
    rows.foreach { r =>
      val c = r.getAs[Long]("n_rows")
      assert(math.abs(c - n / 10.0) <= n / 100.0 + 2,
        s"bin ${r.getAs[Long]("bin")} holds $c of $n — not equi-depth")
    }
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Double]("max_price") <= hi.getAs[Double]("min_price"),
        "bins overlap")
    }
  }

  // ---- round-11 additions -------------------------------------------

  test("linear attribution conserves purchase value across channels") {
    import org.apache.spark.sql.functions._
    val rows = Events.linearAttribution(spark, sf).collect()
    val channels = rows.map(_.getString(0)).toSet
    val valid = graft.core.Tables.events(spark, sf)
      .select(col("event_type")).distinct().collect().map(_.getString(0)).toSet
    assert(channels.subsetOf(valid - "purchase" + "organic"))
    // every purchase's value lands somewhere, split or whole: channel
    // totals must sum to the purchase total (up to the per-split FP ulps)
    val credited = rows.map(_.getDouble(2)).sum
    val total = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum(col("value"))).head.getDouble(0)
    assert(math.abs(credited - total) < 1e-6 * math.max(1.0, math.abs(total)),
      s"credited $credited != purchases $total")
  }

  test("position attribution conserves value and honors the 40/20/40 split") {
    import org.apache.spark.sql.functions._
    val rows = Events.positionAttribution(spark, sf).collect()
    val credited = rows.map(_.getDouble(2)).sum
    val total = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum(col("value"))).head.getDouble(0)
    assert(math.abs(credited - total) < 1e-6 * math.max(1.0, math.abs(total)),
      s"credited $credited != purchases $total")
    // U-shape vs linear: same channels, same credit COUNTS (one per touch +
    // organics), only the split differs
    val linear = Events.linearAttribution(spark, sf).collect()
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap ===
      linear.map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  test("k-anonymity audit: region level folds nation level; flags match counts") {
    val rows = Privacy.kAnonymityAudit(spark, sf).collect()
    val (nat, reg) = rows.partition(_.getString(0) == "nation_segment")
    assert(nat.nonEmpty && reg.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(4) === (r.getLong(2) < 5), "violates_k from n")
      assert(r.getBoolean(5) === (r.getLong(3) < 2), "violates_l from n_sensitive")
    }
    // total rows audited agree between the two generalization levels
    assert(nat.map(_.getLong(2)).sum === reg.map(_.getLong(2)).sum)
    // generalizing can only GROW groups: max region-level group >= max nation-level
    assert(reg.map(_.getLong(2)).max >= nat.map(_.getLong(2)).max)
  }

  test("HITS: sum-normalized scores form a distribution per side") {
    val rows = Graph.hits(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(2)))
    val (hubs, auths) = rows.partition(_._1 == "hub")
    assert(hubs.nonEmpty && auths.nonEmpty)
    rows.foreach { case (_, s) => assert(s >= 0.0 && s <= 1.0) }
    assert(math.abs(hubs.map(_._2).sum - 1.0) < 1e-9, "hub scores sum to 1")
    assert(math.abs(auths.map(_._2).sum - 1.0) < 1e-9, "auth scores sum to 1")
  }

  test("temperature mix: weights sum to 1 and alpha<1 flattens the size ratios") {
    val rows = graft.ops.TrainingMix.temperatureMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(rows.length >= 2)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
    // α = 0.3 compresses: the weight ratio between any two sources must be
    // strictly smaller than their token-count ratio (when counts differ)
    for (Seq((_, na, wa), (_, nb, wb)) <- rows.sortBy(-_._2).toSeq.combinations(2)
         if na > nb) {
      assert(wa / wb < na.toDouble / nb.toDouble,
        s"weight ratio ${wa / wb} not flattened vs size ratio ${na.toDouble / nb}")
      assert(wa > wb, "monotone: bigger source keeps a bigger weight")
    }
  }

  test("temperature feasibility: alpha=0.3 arm recounts q193; budget monotone in alpha") {
    val rows = graft.ops.TrainingMix.temperatureFeasibility(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(0.2, 0.3, 0.5, 0.7, 1.0))
    // the α = 0.3 arm must equal the cap/min/binding recompute from q193's
    // own gated weights — same chain, same floors
    val w = graft.ops.TrainingMix.temperatureMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    val caps = w.map { case (s, nt, wt) => (s, math.floor(nt.toDouble / wt).toLong) }
    val bmax = caps.map(_._2).min
    val arm = rows.find(_._1 == 0.3).get
    assert(arm._2 === w.length.toLong)
    assert(arm._3 === bmax, "budget_max recount from q193 weights")
    assert(arm._4 === caps.filter(_._2 == bmax).map(_._1).min, "binding source")
    val tot = w.map(_._2).sum
    assert(arm._5 === bmax.toDouble / tot.toDouble, "feasible share division")
    // flatter mixes (smaller α) upsample the binding source harder, so the
    // feasible budget can only fall as α falls
    val byAlpha = rows.map(_._3)
    assert(byAlpha.toSeq === byAlpha.sorted.toSeq,
      s"budget_max must be nondecreasing in alpha: $rows")
    rows.foreach { case (_, _, b, _, share) =>
      assert(b >= 0L && share <= 1.0 + 1e-9, "a budget never exceeds the corpus")
    }
  }

  test("mix sampler: rates exact from q332's solution; draw recounted from the hash") {
    import org.apache.spark.sql.functions.{col => c}
    val mix = graft.ops.TrainingMix.domainMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(3), r.getLong(7)))).toMap  // (avail_tokens, required_tokens)
    val rows = graft.ops.TrainingMix.mixSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), Option(r.get(6)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(rows.keySet === mix.keySet, "one sampler row per solver cell")
    // independent draw recount: same hash, same permille threshold
    val docs = graft.core.Tables.documents(spark, sf)
      .select(c("source"), c("lang"),
        graft.ops.TextAnalysis.qualityTokens.cast("long").as("nt"),
        Corpus.hashBucket(c("doc_id"), "mix_v1").as("h"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (k, (rate, nDocs, tok, req, ratio)) =>
      val (avail, required) = mix(k)
      assert(rate === math.min(1000L, required * 1000L / avail), s"cell $k rate")
      assert(req === required)
      val drawn = docs.filter(d => (d._1, d._2) == k && d._4 < rate)
      assert(nDocs === drawn.length.toLong, s"cell $k drawn docs")
      assert(tok === drawn.map(_._3).sum, s"cell $k drawn tokens")
      if (required > 0)
        assert(ratio.contains(tok.toDouble / required.toDouble), s"cell $k ratio")
      else assert(ratio.isEmpty, s"cell $k zero-requirement cells carry no ratio")
    }
  }

  test("epoch sampler: plan identities, hard achieved-ratio bound, remainder recount") {
    import org.apache.spark.sql.functions.{col => c}
    val mix = graft.ops.TrainingMix.domainMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(7)))).toMap // (n_docs, avail, required)
    val rows = graft.ops.TrainingMix.mixSampleEpochs(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getLong(9), Option(r.get(10)).map(_.asInstanceOf[Double])))).toMap
    assert(rows.keySet === mix.keySet, "one epoch row per solver cell")
    val docs = graft.core.Tables.documents(spark, sf)
      .select(c("source"), c("lang"),
        graft.ops.TextAnalysis.qualityTokens.cast("long").as("nt"),
        Corpus.hashBucket(c("doc_id"), "mix_v1").as("h"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (k, (avail, req, epochs, perm, rd, rt, drawn, nDraws, ratio)) =>
      val (nDocs, availM, requiredM) = mix(k)
      assert(avail === availM && req === requiredM, s"cell $k plan inputs")
      assert(epochs === (if (avail > 0) req / avail else 0L), s"cell $k epochs")
      assert(perm === (if (avail > 0) (req % avail) * 1000L / avail else 1000L),
        s"cell $k remainder permille (< 1000 whenever avail > 0)")
      if (avail > 0) assert(perm < 1000L, s"cell $k remainder is a strict fraction")
      val drawnDocs = docs.filter(d => (d._1, d._2) == k && d._4 < perm)
      assert(rd === drawnDocs.length.toLong && rt === drawnDocs.map(_._3).sum,
        s"cell $k remainder draw recount")
      assert(drawn === epochs * avail + rt, s"cell $k drawn identity")
      assert(nDraws === epochs * nDocs + rd, s"cell $k draw-count identity")
      if (req > 0) {
        assert(ratio.contains(drawn.toDouble / req.toDouble), s"cell $k ratio")
        // the HARD bound the epoch construction guarantees: remainder target
        // and remainder draw both live in [0, avail], so the miss is ≤ avail
        assert(math.abs(drawn - req) <= avail, s"cell $k |drawn−required| ≤ avail")
      } else assert(ratio.isEmpty, s"cell $k zero-requirement carries no ratio")
    }
  }

  test("epoch sampler: upsample cells actually oversample (crafted coupled corpus)") {
    import spark.implicits._
    // coupled sources: A is 90% lang x, B is 90% lang y — the independence
    // target gives every cell 25% of a 100-token budget, so the two 10-token
    // off-diagonal cells owe 25 tokens each: epochs 2, remainder 500‰. This
    // is exactly the weight>1 shape q336's capped draw under-delivers
    // (documented there); the epoch sampler must close it.
    val d = tmpDir("epochs")
    val text10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = (1 to 9).map(i => (i.toLong, text10, "x", "A", 60)) ++
      Seq((10L, text10, "y", "A", 60), (11L, text10, "x", "B", 60)) ++
      (12 to 20).map(i => (i.toLong, text10, "y", "B", 60))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = graft.ops.TrainingMix.mixSampleEpochs(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(8),
          r.get(10).asInstanceOf[Double]))).toMap
    val (reqAy, epochsAy, permAy, drawnAy, ratioAy) = rows(("A", "y"))
    assert(reqAy === 25L && epochsAy === 2L && permAy === 500L,
      s"off-diagonal cell plan: required 25 of avail 10 → 2 epochs + 500‰")
    // the single 10-token doc's hash decides the remainder draw; either way
    // the hard bound holds and the cell is no longer starved at 40%
    assert(drawnAy === 20L || drawnAy === 30L, s"drawn $drawnAy")
    assert(math.abs(ratioAy - 1.0) <= 10.0 / 25.0 + 1e-12, "hard bound")
    assert(drawnAy >= 2L * 10L, "never under the full epochs")
    // the capped q336 sampler on the same corpus confesses the starvation
    val capped = graft.ops.TrainingMix.mixSample(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(capped(("A", "y")) === 1000L, "q336 caps at keep-everything")
  }

  test("sampler plans: zero-available and upsample cell shapes (crafted frames)") {
    import spark.implicits._
    // the r16 ADVICE latent shape: a cell whose documents all tokenize to
    // zero must not NULL-hide — both plan functions send it to the
    // keep-everything cap instead of a silent no-draw
    val mix = Seq(
      ("s0", "l0", 3L, 0L, 7L),    // zero available, owes 7
      ("s1", "l1", 2L, 10L, 25L),  // upsample: 2 epochs + 500‰
      ("s2", "l2", 4L, 100L, 25L)) // plain downsample
      .toDF("source", "lang", "n_docs", "avail_tokens", "required_tokens")
    val rates = graft.ops.TrainingMix.sampleRates(mix).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rates("s0") === 1000L, "zero-avail cell: keep everything, no NULL")
    assert(rates("s1") === 1000L && rates("s2") === 250L)
    val plan = graft.ops.TrainingMix.epochPlan(mix).collect()
      .map(r => r.getString(0) -> ((r.getLong(5), r.getLong(6)))).toMap
    assert(plan("s0") === ((0L, 1000L)), "zero-avail cell: 0 epochs, keep-all")
    assert(plan("s1") === ((2L, 500L)) && plan("s2") === ((0L, 250L)))
  }

  test("clean mix: census is q332's minus contaminated docs; solver identities hold") {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val sf = "/root/testdata/sf0.001"
    val rows = graft.ops.TrainingMix.cleanDomainMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(5), r.getLong(9)))).toMap
    // clean census recomputed: non-eval docs q75 clears, ws-token masses
    val verd = Curation.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val cells = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("lang"),
        graft.ops.TextAnalysis.qualityTokens.cast("long").as("nt"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .filter(d => verd.getOrElse(d._1, true) == false) // kept = scored AND clean
      .groupBy(d => (d._2, d._3))
      .map { case (k, ds) => k -> ((ds.size.toLong, ds.map(_._4).sum)) }
    assert(rows.keySet === cells.keySet, "one row per observed CLEAN cell")
    val budget = cells.values.map(_._2).sum / 2
    rows.foreach { case (k, (nd, avail, tgt, b)) =>
      assert((nd, avail) === cells(k), s"cell $k clean census")
      assert(b === budget, "budget = half the CLEAN pool, riding every row")
      assert(tgt > 0.0 && tgt <= 1.0)
    }
    assert(math.abs(rows.values.map(_._3).sum - 1.0) < 1e-9, "targets normalize")
    // the correction is real on the fixture: at least one cell lost tokens
    val raw = graft.ops.TrainingMix.domainMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    assert(rows.exists { case (k, (_, avail, _, _)) => raw(k) > avail },
      "fixture must show contamination actually shrinking some cell")
  }

  test("pool mix: census is exactly reps ∩ quality-keeps ∩ clean; nests in the chain") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val rows = graft.ops.TrainingMix.poolMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // the three gates recomputed independently, intersected doc by doc
    val reps = Graph.dupClusters(spark, sf).filter(col("is_representative"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val clean = Curation.decontaminate(spark, sf).collect()
      .filter(!_.getBoolean(3)).map(_.getLong(0)).toSet
    val keeps = Curation.qualityClassifier(spark, sf).collect()
      .filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    val pool = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("lang"),
        graft.ops.TextAnalysis.qualityTokens.cast("long").as("nt"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .filter(d => reps(d._1) && clean(d._1) && keeps(d._1))
    val cells = pool.groupBy(d => (d._2, d._3))
      .map { case (k, ds) => k -> ((ds.size.toLong, ds.map(_._4).sum)) }
    assert(rows.keySet === cells.keySet, "one row per observed POOL cell")
    rows.foreach { case (k, v) => assert(v === cells(k), s"cell $k pool census") }
    // the pool nests strictly inside q344's clean pool on this fixture
    val cleanMix = graft.ops.TrainingMix.cleanDomainMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    rows.foreach { case (k, (_, avail)) =>
      assert(avail <= cleanMix(k), s"cell $k: pool ⊆ clean pool")
    }
    assert(rows.values.map(_._2).sum < cleanMix.values.sum,
      "fixture must show the dedup/quality gates actually biting")
  }

  test("graduated pool: census recounted per doc; delta over the binary gate is the rescued mass") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val rows = graft.ops.TrainingMix.graduatedPoolMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // the gates and the graduated verdicts recomputed independently per doc
    val reps = Graph.dupClusters(spark, sf).filter(col("is_representative"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keeps = Curation.qualityClassifier(spark, sf).collect()
      .filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    val spans = Curation.leakSpans(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val meta = Corpus.docTokens(spark, sf)
      .filter(Corpus.hashBucket(col("doc_id"), "eval_v1") >= 200)
      .select(col("doc_id"), col("source"), col("lang"), col("n_alpha_toks"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val toksM = meta.map(m => m._1 -> m._4).toMap
    val removed = Curation.passageDecontaminate(spark, sf).collect()
      .filter(_.getBoolean(4))
      .groupBy(_.getLong(0)).map { case (id, ps) =>
        id -> ps.map(p => math.min(8L, toksM(id) - p.getLong(1) * 8L)).sum
      }
    def grade(id: Long): Option[Long] = {
      val run = spans(id)
      if (run > 32L) None
      else if (run > 8L) Some(toksM(id) - removed.getOrElse(id, 0L))
      else Some(toksM(id))
    }
    val entering = meta.filter(m => reps(m._1) && keeps(m._1))
      .flatMap(m => grade(m._1).map(nt => (m._2, m._3, nt)))
    val cells = entering.groupBy(e => (e._1, e._2))
      .map { case (k, es) => k -> ((es.size.toLong, es.map(_._3).sum)) }
    assert(rows.keySet === cells.keySet, "one row per graduated-pool cell")
    rows.foreach { case (k, v) => assert(v === cells(k), s"cell $k census") }
    // the binary-gate pool in the SAME alpha unit is exactly the clean slice
    // (run = 0 ⇔ q75-clean, the q331 reconciliation); the delta is the
    // rescued quote mass + excised-passage mass over the same gated docs
    val gated = meta.filter(m => reps(m._1) && keeps(m._1))
    val binary = gated.filter(m => spans(m._1) == 0L).map(_._4).sum
    val rescued = gated.map(_._1).collect {
      case id if spans(id) >= 1L && spans(id) <= 8L => toksM(id)
      case id if spans(id) > 8L && spans(id) <= 32L =>
        toksM(id) - removed.getOrElse(id, 0L)
    }.sum
    val gradTotal = rows.values.map(_._2).sum
    assert(gradTotal === binary + rescued,
      "graduation rescues exactly the quote + excised-passage mass")
    assert(gradTotal > binary,
      "fixture must show graduation actually rescuing tokens")
  }

  test("graduated sampler: plan identities off q364's cells; draw recounted from the pool frame") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val cells = graft.ops.TrainingMix.graduatedPoolMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(7)))).toMap
    val rows = graft.ops.TrainingMix.graduatedMixSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rows.keySet === cells.keySet, "the sampler realizes q364's cells exactly")
    // the draw recounted from the SAME per-doc pool frame the solver priced
    val pool = graft.ops.TrainingMix
      .graduatedPoolDocs(spark, sf, 5, 8, 200, "eval_v1")
      .select(col("source"), col("lang"), col("nt"),
        Corpus.hashBucket(col("doc_id"), "mix_v1").as("h"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (k, r) =>
      val (nd, avail, req) = cells(k)
      assert(r.getLong(2) === avail && r.getLong(3) === req, s"$k cell identity")
      val epochs = if (avail > 0) req / avail else 0L
      val remPm = if (avail > 0) ((req % avail) * 1000L) / avail else 1000L
      assert(r.getLong(4) === epochs && r.getLong(5) === remPm, s"$k plan")
      val drawn = pool.filter(p => (p._1, p._2) == k && p._4 < remPm)
      assert(r.getLong(6) === drawn.length.toLong, s"$k remainder docs")
      assert(r.getLong(7) === drawn.map(_._3).sum, s"$k remainder tokens")
      assert(r.getLong(8) === epochs * avail + drawn.map(_._3).sum, s"$k drawn")
      assert(r.getLong(9) === epochs * nd + drawn.length, s"$k n_draws")
      if (req > 0L) {
        val ratio = Option(r.get(10)).map(_.asInstanceOf[Double]).get
        assert(math.abs(ratio - 1.0) <= avail.toDouble / req.toDouble + 1e-12,
          s"$k hard delivery bound")
      }
    }
    assert(rows.values.exists(_.getLong(4) >= 1L),
      "fixture pool must actually oversample somewhere")
  }

  test("graduated epoch accounting: ledger recounted from q370's own cells") {
    val sf = "/root/testdata/sf0.001"
    val cells = graft.ops.TrainingMix.graduatedMixSample(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(7), r.getLong(8)))
    // (avail, required, epochs, remainder_tokens, drawn)
    val r = graft.ops.TrainingMix.graduatedEpochAccounting(spark, sf).head
    assert(r.getLong(0) === cells.length.toLong, "n_cells")
    assert(r.getLong(1) === cells.count(_._3 >= 1).toLong, "oversampled cells")
    assert(r.getLong(2) === cells.map(_._2).sum, "required total")
    assert(r.getLong(3) === cells.map(_._5).sum, "drawn total")
    val unique = cells.map(c => if (c._3 >= 1) c._1 else c._4).sum
    assert(r.getLong(4) === unique, "unique = avail for oversampled, remainder else")
    assert(r.getLong(5) === cells.map(_._5).sum - unique, "repeated = drawn − unique")
    assert(r.getDouble(6) === (cells.map(_._5).sum - unique).toDouble / cells.map(_._5).sum)
    assert(r.getLong(1) > 0 && r.getLong(5) > 0,
      "fixture pool mix must oversample somewhere for the ledger to bite")
  }

  test("pool ablation: arms recounted from independent gate flags; nesting holds") {
    import org.apache.spark.sql.functions.col
    val sf = "/root/testdata/sf0.001"
    val rows = graft.ops.TrainingMix.poolAblation(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(rows.keySet === Set("none", "dedup", "quality", "decontam"))
    // independent recompute of all three gates + token masses
    val reps = Graph.dupClusters(spark, sf).filter(col("is_representative"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val verd = Curation.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val keeps = Curation.qualityClassifier(spark, sf).collect()
      .filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.ops.TextAnalysis.qualityTokens.cast("long").as("nt"),
        (Corpus.hashBucket(col("doc_id"), "eval_v1") < 200).as("ev"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    def mass(cond: ((Long, Long, Boolean)) => Boolean) = {
      val sel = docs.filter(cond)
      (sel.length.toLong, sel.map(_._2).sum)
    }
    def clean(id: Long) = verd.get(id).contains(false)
    val full = mass(d => reps(d._1) && clean(d._1) && keeps(d._1))
    val expect = Map(
      "none" -> full,
      "dedup" -> mass(d => clean(d._1) && keeps(d._1)),
      "quality" -> mass(d => reps(d._1) && clean(d._1)),
      "decontam" -> mass(d => reps(d._1) && !d._3 && keeps(d._1)))
    expect.foreach { case (g, (nd, nt)) =>
      val (rd, rt, extra, share) = rows(g)
      assert((rd, rt) === ((nd, nt)), s"$g census")
      assert(extra === nt - full._2 && extra >= 0L, s"$g marginal price")
      assert(share.contains((nt - full._2).toDouble / full._2), s"$g share")
    }
    // 'none' row equals q347's pool, column for column
    val pool = graft.ops.TrainingMix.poolMix(spark, sf).collect()
    assert(rows("none")._1 === pool.map(_.getLong(2)).sum &&
      rows("none")._2 === pool.map(_.getLong(3)).sum,
      "full pool reconciles q347")
    assert(expect.values.map(_._2).max > full._2,
      "fixture must show at least one gate with a real marginal price")
  }

  test("epoch accounting: ledger recounted from q339's own cells") {
    val sf = "/root/testdata/sf0.001"
    val cells = graft.ops.TrainingMix.mixSampleEpochs(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(7), r.getLong(8)))
    // (avail, required, epochs, remainder_tokens, drawn)
    val r = graft.ops.TrainingMix.epochAccounting(spark, sf).head
    assert(r.getLong(0) === cells.length.toLong, "n_cells")
    assert(r.getLong(1) === cells.count(_._3 >= 1).toLong, "oversampled cells")
    assert(r.getLong(2) === cells.map(_._2).sum, "required total")
    assert(r.getLong(3) === cells.map(_._5).sum, "drawn total")
    val unique = cells.map(c => if (c._3 >= 1) c._1 else c._4).sum
    assert(r.getLong(4) === unique, "unique = avail for oversampled, remainder else")
    assert(r.getLong(5) === cells.map(_._5).sum - unique, "repeated = drawn − unique")
    assert(r.getDouble(6) === (cells.map(_._5).sum - unique).toDouble / cells.map(_._5).sum)
    assert(r.getLong(1) > 0 && r.getLong(5) > 0,
      "fixture mix must actually oversample somewhere for the ledger to bite")
  }

  test("domain mix: independence target, weight identity, exact feasibility") {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val rows = graft.ops.TrainingMix.domainMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getLong(7),
        r.getBoolean(8), r.getLong(9)))
    assert(rows.length >= 2)
    // exact inputs recomputed from the corpus
    val cells = graft.core.Tables.documents(spark, sf)
      .select(col("source"), col("lang"),
        graft.ops.TextAnalysis.qualityTokens.cast("long").as("nt"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("nd"), sum(col("nt")).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val totTok = cells.values.map(_._2).sum
    val srcTok = cells.groupBy(_._1._1).map { case (s, m) => s -> m.values.map(_._2).sum }
    val langTok = cells.groupBy(_._1._2).map { case (l, m) => l -> m.values.map(_._2).sum }
    assert(rows.map(t => (t._1, t._2)).toSet === cells.keySet, "one row per observed cell")
    // the independence product, renormalized — recomputed in plain doubles
    // (the engine's 14-decimal bridge is within 1e-12 of this)
    val praw = cells.keys.map { k =>
      k -> (srcTok(k._1).toDouble / totTok) * (langTok(k._2).toDouble / totTok)
    }.toMap
    val z = praw.values.sum
    rows.foreach { case (s, l, nd, tok, aShare, tShare, w, req, feas, budget) =>
      val k = (s, l)
      assert((nd, tok) === cells(k), s"cell $k exact counts")
      assert(aShare === tok.toDouble / totTok, s"cell $k avail share")
      assert(math.abs(tShare - praw(k) / z) < 1e-12, s"cell $k target share")
      assert(w === tShare / aShare, s"cell $k weight identity")
      assert(budget === totTok / 2, "budget rides every row")
      assert(req === math.floor(tShare * budget).toLong, s"cell $k allocation")
      assert(feas === (req <= tok), s"cell $k feasibility")
    }
    assert(math.abs(rows.map(_._6).sum - 1.0) < 1e-9, "target shares sum to 1")
    // an upsampled cell (weight > 1) must be one whose coupled share falls
    // short of the independence product, and vice versa
    rows.foreach { case (_, _, _, _, aShare, tShare, w, _, _, _) =>
      assert((w > 1.0) === (tShare > aShare))
    }
  }

  test("daily anomalies: no stats without a full prior window; flags match z") {
    val rows = graft.ops.Statistics.dailyAnomalies(spark, sf)
      .orderBy("day").collect()
    assert(rows.length > 10)
    rows.take(7).foreach(r => assert(r.isNullAt(3), "first 7 days have no prior"))
    rows.foreach { r =>
      if (!r.isNullAt(5))
        assert(r.getBoolean(6) === (math.abs(r.getDouble(5)) > 2.0))
      else assert(!r.getBoolean(6), "no z, no alarm")
    }
  }

  test("robust daily anomalies: median/MAD recomputed independently per day") {
    // independent recompute of the trailing median/MAD from the raw dailies —
    // the whole statistic is integer cents, so equality is exact
    import org.apache.spark.sql.functions.{col, sum, to_date}
    val daily = graft.core.Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate")).as("day"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy("day").agg(sum("c").as("c"))
      .orderBy("day").collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    val rows = graft.ops.Statistics.robustDailyAnomalies(spark, sf)
      .orderBy("day").collect()
    assert(rows.length === daily.length && rows.length > 10)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getDate(0).toString === daily(i)._1)
      assert(r.getLong(1) === daily(i)._2, "daily cents")
      if (i < 7) {
        assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4), "warmup: no stats")
        assert(!r.getBoolean(5), "warmup: no alarm")
      } else {
        val buf = (i - 7 until i).map(daily(_)._2).sorted
        val med = buf(3)
        val mad = buf.map(v => math.abs(v - med)).sorted.apply(3)
        assert(r.getLong(2) === med, s"median day $i")
        assert(r.getLong(3) === mad, s"MAD day $i")
        if (mad > 0)
          assert(r.getDouble(4) === (daily(i)._2 - med).toDouble / mad)
        else assert(r.isNullAt(4))
        assert(r.getBoolean(5) === (math.abs(daily(i)._2 - med) > 5L * mad),
          s"alarm day $i is the exact integer comparison")
      }
    }
  }

  test("vocabulary growth: new-term series reconciles with Good-Turing vocab") {
    val rows = graft.ops.TermStats.vocabularyGrowth(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, b, nTok, bVocab, nNew, _, rate) =>
      assert(b >= 0 && b < 8, s"$src batch range")
      assert(nNew <= bVocab && bVocab <= nTok, s"$src/$b containment")
      assert(rate === nNew.toDouble / nTok, s"$src/$b rate")
    }
    // per source: cum_vocab is the running sum of n_new_terms in batch order,
    // and its final value is EXACTLY the source's distinct vocabulary as
    // q301's Good-Turing census counts it
    val vocab = graft.ops.TermStats.goodTuringCoverage(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    rows.groupBy(_._1).foreach { case (src, g) =>
      val ordered = g.sortBy(_._2)
      val cums = ordered.map(_._5).scanLeft(0L)(_ + _).drop(1)
      assert(ordered.map(_._6).toSeq === cums.toSeq, s"$src cumulative")
      assert(cums.last === vocab(src), s"$src total vocabulary")
    }
  }

  test("length percentiles: exact order statistics recomputed per source") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = TextAnalysis.lengthPercentiles(spark, sf).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val bySource = docs.groupBy(_._1)
    assert(rows.keySet === bySource.keySet.flatMap(s =>
      Seq(10L, 25L, 50L, 75L, 90L).map(s -> _)), "full source x pct grid")
    bySource.foreach { case (src, ds) =>
      val ordered = ds.sortBy(d => (d._3, d._2)).map(_._3)
      Seq(10L, 25L, 50L, 75L, 90L).foreach { p =>
        val rk = ((p * ordered.length + 99) / 100).toInt
        assert(rows((src, p)) === ((ordered.length.toLong, ordered(rk - 1))),
          s"$src P$p")
      }
    }
  }

  test("tokenizer fertility: per-language rollup recounted from raw text") {
    val rows = TextAnalysis.tokenizerFertility(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    val docs = graft.core.Tables.documents(spark, sf)
      .select("lang", "text", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bpeRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r
    rows.foreach { case (lang, nDocs, nChars, w, b, fert, cpt) =>
      val ds = docs.filter(_._1 == lang)
      assert(nDocs === ds.length.toLong, s"$lang docs")
      assert(nChars === ds.map(_._3).sum, s"$lang chars")
      assert(w === ds.map(d => "[a-z0-9]+".r.findAllIn(d._2.toLowerCase).size.toLong).sum)
      assert(b === ds.map(d => bpeRe.findAllIn(d._2).size.toLong).sum, s"$lang bpe")
      assert(fert === b.toDouble / w && cpt === nChars.toDouble / b, s"$lang ratios")
    }
  }

  test("quality budget curve: tiles partition the corpus; cumulative share reaches 1") {
    val rows = Corpus.qualityBudgetCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1L to 10L).toSeq, "all ten tiles present")
    val nDocs = graft.core.Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum === nDocs, "tiles partition the documents")
    // cumulative columns are the running sums of the tile columns
    val cums = rows.map(_._3).scanLeft(0L)(_ + _).drop(1)
    assert(rows.map(_._4).toSeq === cums.toSeq)
    assert(math.abs(rows.last._5 - 1.0) < 1e-12, "full corpus = share 1")
    assert(rows.map(_._5).toSeq === rows.map(_._5).sorted.toSeq, "share monotone")
    // top tile holds the HIGHEST-quality docs: recompute the top decile's
    // token sum from the raw scores
    import org.apache.spark.sql.functions.{col, expr, lower, regexp_extract_all, size, lit}
    val scored = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), TextAnalysis.qualityScore.as("q"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
          .cast("long").as("t"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val byRank = scored.sortBy(d => (-d._2, d._1))
    val tile1 = byRank.zipWithIndex
      .filter { case (_, i) => i.toLong * 10 / scored.length == 0 }.map(_._1)
    assert(rows.head._3 === tile1.map(_._3).sum, "top tile token recount")
  }

  test("percentile normalization: [0,1] endpoints per language, monotone in length") {
    val rows = Corpus.percentileNormalize(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, p) => assert(p >= 0.0 && p <= 1.0) }
    rows.groupBy(_._1).foreach { case (lang, g) =>
      if (g.length >= 2) {
        assert(g.map(_._3).min == 0.0 && g.map(_._3).max == 1.0, lang)
        // percentile order respects the length order
        val sorted = g.sortBy(_._3)
        assert(sorted.map(_._2).sameElements(sorted.map(_._2).sorted), lang)
      }
    }
  }

  test("chi-square independence: full grid, marginals conserved, exact recompute") {
    val rows = graft.ops.Statistics.chiSquareLangLength(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getLong(8)))
    assert(rows.nonEmpty)
    val langs = rows.map(_._1).distinct
    val bands = rows.map(_._2).distinct
    assert(rows.length === langs.length * bands.length, "every grid cell present")
    val n = graft.core.Tables.documents(spark, sf).count()
    assert(rows.map(_._3).sum === n, "observed counts partition the corpus")
    // marginals: each lang's rt is its observed row sum; same for bands
    rows.groupBy(_._1).foreach { case (lang, g) =>
      assert(g.map(_._3).sum === g.head._4, s"$lang row marginal")
    }
    rows.groupBy(_._2).foreach { case (band, g) =>
      assert(g.map(_._3).sum === g.head._5, s"$band column marginal")
    }
    assert(math.abs(rows.map(_._6).sum - n) < 1e-6 * n, "expectations sum to n")
    val dof = rows.head._9
    assert(dof === (langs.length - 1).toLong * (bands.length - 1))
    // cell and total recomputed with the operator's own spelling
    rows.foreach { case (_, _, o, _, _, e, cell, _, _) =>
      assert(cell === (o.toDouble - e) * (o.toDouble - e) / e)
    }
    // quantize via the SHORTEST STRING (Spark casts double→decimal through
    // the string form; BigDecimal(double) would use the full binary
    // expansion — the documented §8.4 trap)
    val total = rows.map(c => BigDecimal(c._7.toString)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    assert(rows.head._8 === total, "chi2 equals the 9-decimal quantized fold")
    assert(rows.map(_._8).distinct.length === 1, "one total broadcast to all rows")
  }

  test("concentration: tiles partition customers, Lorenz curve convex, shares exact") {
    val rows = graft.ops.Statistics.revenueConcentration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).sortBy(_._1)
    assert(rows.length === 10)
    val nCust = graft.core.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.map(_._2).sum === nCust, "tiles partition the customers")
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1,
      "floor distribution keeps tile sizes within one")
    val total = rows.map(_._3).sum
    assert(rows.last._4 === total && rows.last._5 === 1.0, "curve ends at 1")
    rows.foldLeft(0L) { case (acc, (t, _, tc, cc, cs, ts)) =>
      assert(cc === acc + tc, s"tile $t cumulative telescopes")
      assert(cs === cc.toDouble / total && ts === tc.toDouble / total, s"tile $t shares")
      cc
    }
    // convexity: mean revenue per customer is non-decreasing across tiles
    val means = rows.map(r => r._3.toDouble / r._2)
    assert(means.sliding(2).forall { case Array(a, b) => b >= a; case _ => true },
      "ranked tiles must have non-decreasing per-customer revenue")
  }

  test("cramers v: bounded effect size, identities against the chi-square table") {
    val r = graft.ops.Statistics.cramersV(spark, sf).collect().head
    val (chi2, dof, n) = (r.getDouble(0), r.getLong(1), r.getLong(2))
    val (phi2, v) = (r.getDouble(3), r.getDouble(4))
    assert(v >= 0.0 && v <= 1.0 + 1e-12)
    assert(phi2 === chi2 / n)
    val cells = graft.ops.Statistics.chiSquareLangLength(spark, sf).collect()
    assert(chi2 === cells.head.getDouble(7) && dof === cells.head.getLong(8),
      "summary rides the same chi-square")
    assert(n === cells.map(_.getLong(2)).sum)
    val k = math.min(cells.map(_.getString(0)).distinct.length - 1,
      cells.map(_.getString(1)).distinct.length - 1)
    assert(v === math.sqrt(chi2 / (n.toDouble * k)))
  }

  test("percentile normalization: NULL lang is its own partition, not dropped") {
    import spark.implicits._
    val d = tmpDir("pctnull")
    // two null-lang docs (a 2-row partition: pct 0 and 1) + three "en"
    Seq((1L, "aa", null.asInstanceOf[String], 10L), (2L, "bb", null.asInstanceOf[String], 20L),
        (3L, "cc", "en", 5L), (4L, "dd", "en", 6L), (5L, "ee", "en", 7L))
      .toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = Corpus.percentileNormalize(spark, d).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1), r.getDouble(3)))
    assert(rows.length === 5, "null-lang rows must survive the rank joins")
    val nulls = rows.filter(_._2 == null).sortBy(_._1)
    assert(nulls.map(_._3).toSeq === Seq(0.0, 1.0),
      "the NULL partition ranks within itself, exactly percent_rank semantics")
    assert(rows.filter(_._2 == "en").map(_._3).sorted.toSeq === Seq(0.0, 0.5, 1.0))
  }

  test("min-max scaler apply: fixed points 0 and 1 per non-constant dimension") {
    val rows = graft.ops.Stats.scaledDimProfile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(3)) {
        assert(r.getDouble(3) === 0.0, "scaled min")
        assert(r.getDouble(4) === 1.0, "scaled max")
        val mean = r.getDouble(5)
        assert(mean > 0.0 && mean < 1.0)
      }
    }
  }

  test("retention half-life: slope from a direct recompute; half-life identity") {
    import org.apache.spark.sql.functions._
    val rows = Events.retentionHalfLife(spark, sf).collect()
    assert(rows.nonEmpty)
    val curves = Events.retentionCohorts(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val cohort = r.getDate(0).toString
      val slope = r.getDouble(2)
      assert(r.getLong(1) >= 2)
      // direct least-squares recompute over ln(n_k/n_0)
      val pts0 = curves(cohort)
      val n0 = pts0.find(_._2 == 0L).get._3.toDouble
      val pts = pts0.filter(_._2 >= 1L)
        .map(p => (p._2.toDouble, math.log(p._3 / n0)))
      val n = pts.length
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val direct = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(slope - direct) < 1e-9 * math.max(1.0, math.abs(direct)))
      if (!r.isNullAt(3)) {
        assert(slope < 0)
        assert(math.abs(r.getDouble(3) - math.log(2.0) / -slope) < 1e-9)
      }
    }
  }

  test("CUSUM closed form equals the textbook recursion") {
    val rows = graft.ops.Statistics.cusumShift(spark, sf).orderBy("day").collect()
    assert(rows.length > 10)
    val xs = rows.map(_.getDouble(1))
    val mu = xs.sum / xs.length
    val total = xs.sum
    var s = 0.0
    rows.zip(xs).foreach { case (r, x) =>
      s = math.max(0.0, s + (x - mu))
      val got = r.getDouble(2)
      assert(math.abs(got - s) <= 1e-6 * math.max(1.0, math.abs(s)),
        s"day ${r.getDate(0)}: closed form $got vs recursion $s")
      // the alarm is the exact-decimal 5%-of-total rule (skip FP boundary ties)
      val margin = got * 20 - total
      if (math.abs(margin) > 1e-3 * math.max(1.0, total))
        assert(r.getBoolean(3) === (margin > 0))
    }
  }

  test("quality classifier: scores are probabilities and keep is the 0.5 cut") {
    val rows = graft.ops.Curation.qualityClassifier(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getDouble(1)
      assert(s > 0.0 && s < 1.0, s"score $s not in (0,1)")
      // keep is the sign of the quantized logit, i.e. score >= 0.5 away
      // from the rounding boundary (a |z| < 5e-10 doc could round onto it)
      if (math.abs(s - 0.5) > 1e-9)
        assert(r.getBoolean(2) === (s >= 0.5))
    }
  }

  /** The two samples the KS / rank-sum tests compare, collected driver-side
    * for naive recomputes (sf0.001: a few hundred rows each).
    */
  private def prioritySamplePair(): (Array[Double], Array[Double]) = {
    val rows = graft.core.Tables.orders(spark, sf)
      .select("o_orderpriority", "o_totalprice").collect()
    def sample(p: String) =
      rows.filter(_.getString(0) == p).map(_.getDouble(1)).sorted
    (sample("1-URGENT"), sample("5-LOW"))
  }

  test("ks test: the two-phase D equals the naive all-jumps recompute exactly") {
    val r = Statistics.ksTest(spark, sf).collect().head
    val (s1, s2) = prioritySamplePair()
    val (n1, n2) = (s1.length.toLong, s2.length.toLong)
    assert(r.getLong(0) === n1 && r.getLong(1) === n2)
    // naive: evaluate |cum1*n2 - cum2*n1| at every distinct value
    val dNum = (s1 ++ s2).distinct.map { v =>
      val c1 = s1.count(_ <= v).toLong
      val c2 = s2.count(_ <= v).toLong
      math.abs(c1 * n2 - c2 * n1)
    }.max
    assert(r.getLong(2) === dNum, "integer KS numerator")
    val ks = r.getDouble(3)
    assert(ks >= 0.0 && ks <= 1.0)
    assert(ks === dNum.toDouble / (n1.toDouble * n2.toDouble))
  }

  test("rank sum: 2U equals the naive pairwise count, z consistent") {
    val r = Statistics.rankSum(spark, sf).collect().head
    val (s1, s2) = prioritySamplePair()
    // naive doubled-U: 2 per win, 1 per tie, over all (a, b) pairs
    val u2x = s1.map(a => s2.map(b =>
      if (a > b) 2L else if (a == b) 1L else 0L).sum).sum
    assert(r.getDouble(2) === u2x.toDouble / 2.0, "U1 from pairwise count")
    val (u1, mu, sigma, z) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(mu === s1.length.toDouble * s2.length.toDouble / 2.0)
    assert(sigma > 0.0)
    assert(z === (u1 - mu) / sigma)
  }

  test("cliff's delta: GT/TIE/LT equal the naive pairwise census") {
    val r = Statistics.cliffsDelta(spark, sf).collect().head
    val (s1, s2) = prioritySamplePair()
    var gt = 0L; var tie = 0L; var lt = 0L
    for (a <- s1; b <- s2) {
      if (a > b) gt += 1 else if (a == b) tie += 1 else lt += 1
    }
    assert(r.getLong(0) === s1.length.toLong)
    assert(r.getLong(1) === s2.length.toLong)
    assert(r.getLong(2) === gt, "greater pairs")
    assert(r.getLong(3) === tie, "tied pairs")
    assert(r.getLong(4) === lt, "lesser pairs")
    val delta = (gt - lt).toDouble / (s1.length.toLong * s2.length.toLong).toDouble
    assert(r.getDouble(5) === delta, "one exact division")
    assert(delta >= -1.0 && delta <= 1.0)
  }

  test("wasserstein: the CDF-segment fold equals the naive integral recompute") {
    val r = Statistics.wasserstein1d(spark, sf).collect().head
    val docs = graft.core.Tables.documents(spark, sf)
      .selectExpr("source", "CAST(n_chars AS BIGINT) AS x")
      .collect().map(t => (t.getString(0), t.getLong(1)))
      .filter(t => t._1 == "src0" || t._1 == "src1")
    val s1 = docs.filter(_._1 == "src0").map(_._2).sorted
    val s2 = docs.filter(_._1 == "src1").map(_._2).sorted
    val support = (s1 ++ s2).distinct.sorted
    var num = BigInt(0)
    support.dropRight(1).zip(support.drop(1)).foreach { case (v, next) =>
      val cum1 = s1.count(_ <= v).toLong
      val cum2 = s2.count(_ <= v).toLong
      num += BigInt((cum1 * s2.length - cum2 * s1.length).abs) * (next - v)
    }
    assert(r.getLong(0) === s1.length.toLong)
    assert(r.getLong(1) === s2.length.toLong)
    assert(r.getDouble(2) === num.toString.toDouble, "segment fold")
    assert(r.getDouble(3) ===
      num.toString.toDouble / (s1.length.toDouble * s2.length.toDouble))
    // W₁ dominates the mean shift (1-Lipschitz duality)
    val meanGap = math.abs(s1.sum.toDouble / s1.length - s2.sum.toDouble / s2.length)
    assert(r.getDouble(3) >= meanGap - 1e-9)
  }

  test("gini: matches the exact rank-formula recompute, bounded in [0, 1)") {
    val rows = Statistics.giniBySegment(spark, sf).collect()
    assert(rows.length === 5, "one row per market segment")
    val spends = graft.core.Tables.orders(spark, sf)
      .join(graft.core.Tables.customer(spark, sf),
        org.apache.spark.sql.functions.col("o_custkey") ===
          org.apache.spark.sql.functions.col("c_custkey"))
      .select("c_mktsegment", "c_custkey", "o_totalprice").collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .map { case ((seg, ck), rs) =>
        // exact cents via the same decimal rounding as the operator
        (seg, ck, rs.map(r => BigDecimal(r.getDouble(2))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum * 100)
      }.toSeq
    rows.foreach { r =>
      val seg = r.getString(0)
      val xs = spends.filter(_._1 == seg).sortBy(t => (t._3, t._2)).map(_._3)
      val n = xs.length.toLong
      assert(r.getLong(1) === n)
      val sx = xs.sum
      val six = xs.zipWithIndex.map { case (x, i) => x * (i + 1) }.sum
      val gini = ((2 * six - (n + 1) * sx) / (n * sx)).toDouble
      assert(math.abs(r.getDouble(3) - gini) < 1e-12, s"$seg gini")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) < 1.0)
    }
  }

  test("bootstrap: one replica recomputed from the hash weights; CI ordered and tight-ish") {
    val r = Statistics.bootstrapCi(spark, sf).collect().head
    val (nDays, nReps, mean, lo, hi) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(nReps === 200L)
    assert(lo < hi, "percentile bounds ordered")
    assert(lo < mean && mean < hi, "observed mean inside its own 95% CI")
    // replica 0 recomputed driver-side with the identical md5 -> Poisson rule
    val daily = graft.core.Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("o_orderdate")).as("day"),
        org.apache.spark.sql.functions.col("o_totalprice"))
      .collect()
      .groupBy(_.getDate(0).toString)
      .map { case (d, rs) => d -> rs.map(x => (BigDecimal(x.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact).sum }
    assert(daily.size.toLong === nDays)
    val md = java.security.MessageDigest.getInstance("MD5")
    val thresholds = Array(0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
      0.9810118431238463, 0.9963401531726563, 0.9994058151824183)
    def weight(day: String, b: Long): Long = {
      val hex = md.digest(s"$day:$b".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
      thresholds.indexWhere(u < _) match { case -1 => 6L; case k => k.toLong }
    }
    val (swx, sw) = daily.foldLeft((0L, 0L)) { case ((ax, aw), (d, x)) =>
      val w = weight(d, 0L); (ax + w * x, aw + w)
    }
    val rep0 = swx.toDouble / sw.toDouble
    // the replica mean must be one of the 200 ranked means and lie in a
    // plausible band around the observed mean
    assert(math.abs(rep0 - mean) < 0.2 * mean, s"replica 0 mean $rep0 vs $mean")
  }

  test("price elasticity: bounded corr, one brand recomputed from raw monthly sums") {
    val rows = Market.priceElasticity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (b, n, _, corr) =>
      assert(n > 1, b)
      assert(corr >= -1.0 - 1e-12 && corr <= 1.0 + 1e-12, s"$b corr $corr")
    }
    val (brand, nMonths, elasticity, _) = rows.head
    import org.apache.spark.sql.functions.{col => c}
    val monthly = graft.core.Tables.lineitem(spark, sf)
      .join(graft.core.Tables.part(spark, sf), c("l_partkey") === c("p_partkey"))
      .filter(c("p_brand") === brand)
      .select(c("l_shipdate"), c("l_extendedprice"), c("l_quantity")).collect()
      .groupBy { r =>
        val d = r.getAs[java.time.LocalDateTime](0)
        d.getYear * 12 + d.getMonthValue
      }
      .map { case (_, rs) =>
        def dec(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        val sp = rs.map(r => dec(r.getDouble(1))).sum
        val sq = rs.map(r => dec(r.getDouble(2))).sum
        val q12 = (x: Double) =>
          BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
        (q12(math.log(sp.toDouble / sq.toDouble)), q12(math.log(sq.toDouble)))
      }.toSeq
    assert(monthly.size.toLong === nMonths)
    def fold(vs: Seq[Double]) = vs.map(v =>
      BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    val n = monthly.size.toDouble
    val (sx, sy) = (fold(monthly.map(_._1)), fold(monthly.map(_._2)))
    val sxy = fold(monthly.map(t => t._1 * t._2))
    val sxx = fold(monthly.map(t => t._1 * t._1))
    val expect = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(elasticity - expect) < 1e-9, s"$brand: $elasticity vs $expect")
  }

  test("span corruption: sentinels reconstruct the original token stream exactly") {
    val rows = graft.ops.Corpus.spanCorruption(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    assert(rows.nonEmpty)
    val texts = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    var anyMasked = 0
    rows.foreach { case (docId, nTokens, nMasked, corrupted, targets) =>
      val toks = "[a-z0-9]+".r.findAllIn(texts(docId).toLowerCase).toArray
      assert(nTokens === toks.length.toLong, s"doc $docId token count")
      assert(nMasked <= nTokens && nMasked >= 0)
      if (nMasked > 0) anyMasked += 1
      // rebuild: substitute each sentinel with its target span
      val spanOf = "<X_(\\d+)> ((?:(?!<X_)\\S+ ?)*)".r
        .findAllMatchIn(targets).map(m => m.group(1) -> m.group(2).trim).toMap
      val rebuilt = corrupted.split(" ").flatMap { piece =>
        if (piece.startsWith("<X_")) spanOf(piece.drop(3).dropRight(1)).split(" ").filter(_.nonEmpty)
        else Array(piece)
      }
      assert(rebuilt.sameElements(toks), s"doc $docId reconstruction")
    }
    assert(anyMasked > 0, "the mask rule must fire somewhere in the corpus")
  }

  test("benford: digits partition the table, probabilities close, chi2 is the term sum") {
    val rows = Statistics.benfordDigits(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.map(_._1).sorted.sameElements(1 to 9))
    assert(rows.map(_._2).sum === rows.head._3, "digit counts partition the orders")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12, "observed probs sum to 1")
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-9, "Benford probs sum to 1")
    val total = rows.map(t => BigDecimal(t._6).setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(math.abs(rows.head._7 - total.toDouble) < 1e-9, "chi2 total folds the terms")
    assert(rows.forall(_._7 == rows.head._7), "total repeated on every row")
  }

  test("two-feature OLS: betas match an independent Gaussian-elimination solve") {
    val sf = "/root/testdata/sf0.001"
    val row = Statistics.olsTwoFeature(spark, sf).collect().head
    // independent recompute: exact BigDecimal moments off the raw rows,
    // then Gaussian elimination with partial pivoting (a DIFFERENT solver
    // than the operator's Cramer expansion)
    val rows = graft.core.Tables.lineitem(spark, sf)
      .select("l_quantity", "l_discount", "l_extendedprice").collect()
      .map(r => (BigDecimal(r.getDouble(0).toString).setScale(4),
        BigDecimal(r.getDouble(1).toString).setScale(4),
        BigDecimal(r.getDouble(2).toString).setScale(4)))
    val n = rows.length
    def S(f: ((BigDecimal, BigDecimal, BigDecimal)) => BigDecimal): Double =
      rows.map(f).sum.toDouble
    val (s1, s2, sy) = (S(_._1), S(_._2), S(_._3))
    val (s11, s22, s12) = (S(t => t._1 * t._1), S(t => t._2 * t._2), S(t => t._1 * t._2))
    val (s1y, s2y, syy) = (S(t => t._1 * t._3), S(t => t._2 * t._3), S(t => t._3 * t._3))
    val a = Array(
      Array(n.toDouble, s1, s2, sy),
      Array(s1, s11, s12, s1y),
      Array(s2, s12, s22, s2y))
    for (col <- 0 until 3) {
      val p = (col until 3).maxBy(r => math.abs(a(r)(col)))
      val tmp = a(col); a(col) = a(p); a(p) = tmp
      for (r <- 0 until 3 if r != col) {
        val f = a(r)(col) / a(col)(col)
        for (c <- col until 4) a(r)(c) -= f * a(col)(c)
      }
    }
    val beta = (0 until 3).map(i => a(i)(3) / a(i)(i))
    assert(row.getLong(0) === n.toLong)
    assert(math.abs(row.getDouble(1) - beta(0)) < 1e-6 * math.max(1.0, math.abs(beta(0))), "beta0")
    assert(math.abs(row.getDouble(2) - beta(1)) < 1e-6 * math.max(1.0, math.abs(beta(1))), "beta_qty")
    assert(math.abs(row.getDouble(3) - beta(2)) < 1e-6 * math.max(1.0, math.abs(beta(2))), "beta_disc")
    val r2 = row.getDouble(4)
    // the synthetic testdata draws price independently of quantity, so R²
    // is tiny — only the mathematical bound is an invariant here
    assert(r2 >= 0.0 && r2 <= 1.0, s"r2 $r2 out of [0,1]")
  }

  /** (cents, priority) rows collected once for the k-sample test recomputes. */
  private lazy val centsGroups: Array[(Long, String)] =
    graft.core.Tables.orders(spark, sf)
      .select("o_totalprice", "o_orderpriority").collect()
      .map(r => ((BigDecimal(r.getDouble(0).toString).setScale(2) * 100).toLongExact,
        r.getString(1)))

  test("kruskal-wallis: H recomputed from an independent midrank sort") {
    val row = Statistics.kruskalWallis(spark, sf).collect().head
    val n = centsGroups.length
    // midranks by full sort (a DIFFERENT algorithm than the two-phase
    // cumulative engine): rank sum per group, then the H formula
    val sorted = centsGroups.map(_._1).sorted
    val firstRank = sorted.zipWithIndex.reverse.toMap.map { case (v, i) => (v, i + 1) }
    val tieCount = sorted.groupBy(identity).map { case (v, a) => (v, a.length) }
    def midrank(v: Long): Double = firstRank(v) + (tieCount(v) - 1) / 2.0
    val byGroup = centsGroups.groupBy(_._2)
    val k = byGroup.size
    val sumTerm = byGroup.values.map { g =>
      val r = g.map(t => midrank(t._1)).sum
      r * r / g.length
    }.sum
    val h = 12.0 / (n.toDouble * (n + 1)) * sumTerm - 3.0 * (n + 1)
    val tie3 = tieCount.values.map(t => t.toLong * t * t - t).sum
    val hAdj = h / (1.0 - tie3.toDouble / (n.toLong * n * n - n))
    assert(row.getLong(0) === k.toLong)
    assert(row.getLong(1) === n.toLong)
    assert(row.getLong(2) === tie3, "tie term")
    assert(math.abs(row.getDouble(3) - h) < 1e-9 * math.abs(h), "H")
    assert(math.abs(row.getDouble(4) - hAdj) < 1e-9 * math.abs(hAdj), "tie-adjusted H")
    assert(row.getLong(5) === (k - 1).toLong)
  }

  test("anova F: SSB/SSW recomputed from exact BigInt moments; SST decomposes") {
    val row = Statistics.anovaF(spark, sf).collect().head
    val byGroup = centsGroups.groupBy(_._2)
    def moments(xs: Iterable[Long]): (Long, BigInt, BigInt) =
      (xs.size.toLong, xs.map(BigInt(_)).sum, xs.map(x => BigInt(x) * x).sum)
    val (nT, sT, ssT) = moments(centsGroups.map(_._1))
    val sst = ssT.toDouble - sT.toDouble * sT.toDouble / nT
    val ssw = byGroup.values.map { g =>
      val (ng, sg, ssg) = moments(g.map(_._1))
      ssg.toDouble - sg.toDouble * sg.toDouble / ng
    }.sum
    val ssb = sst - ssw
    assert(row.getLong(0) === byGroup.size.toLong)
    assert(row.getLong(1) === nT)
    assert(math.abs(row.getDouble(2) - ssb) < 1e-9 * ssb, "SSB")
    assert(math.abs(row.getDouble(3) - ssw) < 1e-9 * ssw, "SSW")
    val f = (ssb / (byGroup.size - 1)) / (ssw / (nT - byGroup.size))
    assert(math.abs(row.getDouble(4) - f) < 1e-9 * math.abs(f), "F")
    assert(row.getDouble(5) >= 0.0 && row.getDouble(5) <= 1.0, "eta² in [0,1]")
  }

  test("brown-forsythe: group lower medians and W recomputed independently") {
    val row = Statistics.brownForsythe(spark, sf).collect().head
    val byGroup = centsGroups.groupBy(_._2)
    // lower median: value at rank ceil(n/2) of the sorted group
    def lowerMedian(xs: Array[Long]): Long = {
      val s = xs.sorted; s((s.length + 1) / 2 - 1)
    }
    val devs = byGroup.values.flatMap { g =>
      val m = lowerMedian(g.map(_._1))
      g.map(t => math.abs(t._1 - m))
    }.toArray
    val devByGroup = byGroup.values.map { g =>
      val m = lowerMedian(g.map(_._1))
      g.map(t => math.abs(t._1 - m))
    }
    val nT = devs.length
    val sT = devs.map(BigInt(_)).sum
    val ssT = devs.map(d => BigInt(d) * d).sum
    val sst = ssT.toDouble - sT.toDouble * sT.toDouble / nT
    val ssw = devByGroup.map { g =>
      val s = g.map(BigInt(_)).sum
      val ss = g.map(d => BigInt(d) * d).sum
      ss.toDouble - s.toDouble * s.toDouble / g.size
    }.sum
    val ssb = sst - ssw
    val w = (ssb / (byGroup.size - 1)) / (ssw / (nT - byGroup.size))
    assert(row.getLong(0) === byGroup.size.toLong)
    assert(row.getLong(1) === nT.toLong)
    assert(math.abs(row.getDouble(2) - ssb) < 1e-9 * math.abs(ssb), "SSB on deviations")
    assert(math.abs(row.getDouble(3) - ssw) < 1e-9 * ssw, "SSW on deviations")
    assert(math.abs(row.getDouble(4) - w) < 1e-9 * math.abs(w), "W")
  }

  test("jarque-bera: moments recomputed from q251's residuals via a two-pass central solve") {
    val row = Statistics.jarqueBera(spark, sf).collect().head
    val xs = TimeSeries.seasonalDecompose(spark, sf).collect()
      .map(_.getDouble(6) / 100.0)
    val n = xs.length
    // independent TWO-PASS recompute (the operator expands one-pass raw
    // moments; agreeing central moments prove the expansion)
    val mean = xs.sum / n
    def cm(k: Int) = xs.map(x => math.pow(x - mean, k)).sum / n
    val m2 = cm(2); val m3 = cm(3); val m4 = cm(4)
    val skew = m3 / math.sqrt(m2 * m2 * m2)
    val kurt = m4 / (m2 * m2)
    val jb = n / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
    assert(row.getLong(0) === n.toLong)
    assert(math.abs(row.getDouble(1) - m2) < 1e-6 * m2, "m2")
    assert(math.abs(row.getDouble(2) - skew) < 1e-6 * math.max(1.0, math.abs(skew)), "skewness")
    assert(math.abs(row.getDouble(3) - kurt) < 1e-6 * kurt, "kurtosis")
    assert(math.abs(row.getDouble(4) - jb) < 1e-5 * math.max(1.0, jb), "JB")
    assert(row.getBoolean(5) === (row.getDouble(4) > 5.991))
  }

  test("welch t: moments, variance, t and df recomputed from exact BigInt folds") {
    val row = Statistics.welchT(spark, sf).collect().head
    val groups = centsGroups.filter(t => t._2 == "1-URGENT" || t._2 == "5-LOW")
      .groupBy(_._2).map { case (g, xs) => (g, xs.map(_._1)) }
    val x1 = groups("1-URGENT"); val x2 = groups("5-LOW")
    def stats(xs: Array[Long]): (Long, Double, Double) = {
      val n = xs.length
      val s = xs.map(BigInt(_)).sum
      val ss = xs.map(x => BigInt(x) * x).sum
      val v = (ss.toDouble - s.toDouble * s.toDouble / n) / (n - 1.0)
      (n.toLong, s.toDouble / n, v)
    }
    val (n1, m1, v1) = stats(x1); val (n2, m2, v2) = stats(x2)
    val se2 = v1 / n1 + v2 / n2
    val t = (m1 - m2) / math.sqrt(se2)
    val df = se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1.0) +
      (v2 / n2) * (v2 / n2) / (n2 - 1.0))
    assert(row.getLong(0) === n1)
    assert(row.getLong(1) === n2)
    assert(math.abs(row.getDouble(2) - m1) < 1e-9 * m1, "mean1")
    assert(math.abs(row.getDouble(3) - m2) < 1e-9 * m2, "mean2")
    assert(math.abs(row.getDouble(4) - t) < 1e-9 * math.max(1.0, math.abs(t)), "t")
    assert(math.abs(row.getDouble(5) - df) < 1e-6 * df, "Welch df")
    assert(df >= math.min(n1, n2) - 1.0 && df <= n1 + n2 - 2.0,
      "Welch df bracketed by the classical bounds")
  }

  test("heaps fit: cumulatives recomputed exactly; the fit solves its own normal equations") {
    val rows = TermStats.heapsFit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length === 32, "one row per prefix bucket")
    // exact recompute of both cumulatives from the raw corpus
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toArray))
    val mx = docs.map(_._1).max
    def bucket(id: Long) = id * 32 / (mx + 1)
    val tokPer = docs.groupBy(d => bucket(d._1)).map { case (b, ds) =>
      (b, ds.map(_._2.length.toLong).sum) }
    val firstB = docs.flatMap(d => d._2.map(t => (t, bucket(d._1))))
      .groupBy(_._1).map { case (_, xs) => xs.map(_._2).min }
    val newPer = firstB.groupBy(identity).map { case (b, xs) => (b, xs.size.toLong) }
    var ct = 0L; var cv = 0L
    rows.sortBy(_._1).foreach { case (b, cumT, cumV, nPts, beta, lnK) =>
      ct += tokPer.getOrElse(b, 0L); cv += newPer.getOrElse(b, 0L)
      assert(cumT === ct, s"bucket $b cumulative tokens")
      assert(cumV === cv, s"bucket $b cumulative vocab")
      assert(nPts === 32L)
      assert(beta === rows.head._5 && lnK === rows.head._6, "fit repeated")
    }
    // the OLS fit satisfies its own normal equations on the 32 log points
    val pts = rows.sortBy(_._1).map(r => (math.log(r._2.toDouble), math.log(r._3.toDouble)))
    val n = pts.length
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val (sxx, sxy) = (pts.map(p => p._1 * p._1).sum, pts.map(p => p._1 * p._2).sum)
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val lnK = (sy - beta * sx) / n
    assert(math.abs(rows.head._5 - beta) < 1e-6 * math.max(1.0, math.abs(beta)), "beta")
    assert(math.abs(rows.head._6 - lnK) < 1e-6 * math.max(1.0, math.abs(lnK)), "lnK")
    // the synthetic corpus saturates its 31-term vocabulary immediately, so
    // beta must be ~0 here; natural corpora sit near 0.5 — only the
    // saturation invariant is data-independent
    assert(rows.head._5 >= -0.01 && rows.head._5 <= 1.0, "beta in a sane range")
  }

  test("ols influence: hat-matrix identities and an independent Cook ranking") {
    val rows = Statistics.olsInfluence(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(rows.length === 20)
    // leverage of a 3-parameter model lives in (0, 1); top-20 is sorted
    rows.foreach { case (_, _, _, _, _, h, _, d) =>
      assert(h > 0.0 && h < 1.0, s"leverage $h out of (0,1)")
      assert(d >= 0.0, "Cook's distance nonnegative")
    }
    assert(rows.map(_._8).sliding(2).forall { case Array(a, b) => a >= b },
      "descending Cook order")
    // independent recompute: fit the regression locally (Gaussian
    // elimination over BigDecimal moments), then Cook's D per row; the
    // operator's top-20 key set must equal the local top-20
    val data = graft.core.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_extendedprice").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    val n = data.length
    def S(f: ((Long, Long, Double, Double, Double)) => BigDecimal): Double =
      data.map(f).sum.toDouble
    def b4(d: Double) = BigDecimal(d.toString).setScale(4)
    val s1 = S(t => b4(t._3)); val s2 = S(t => b4(t._4)); val sy = S(t => b4(t._5))
    val s11 = S(t => b4(t._3) * b4(t._3)); val s22 = S(t => b4(t._4) * b4(t._4))
    val s12 = S(t => b4(t._3) * b4(t._4)); val s1y = S(t => b4(t._3) * b4(t._5))
    val s2y = S(t => b4(t._4) * b4(t._5)); val syy = S(t => b4(t._5) * b4(t._5))
    val a = Array(
      Array(n.toDouble, s1, s2, sy),
      Array(s1, s11, s12, s1y),
      Array(s2, s12, s22, s2y))
    for (c <- 0 until 3) {
      val p = (c until 3).maxBy(r => math.abs(a(r)(c)))
      val tmp = a(c); a(c) = a(p); a(p) = tmp
      for (r <- 0 until 3 if r != c) {
        val f = a(r)(c) / a(c)(c)
        for (cc <- c until 4) a(r)(cc) -= f * a(c)(cc)
      }
    }
    val beta = (0 until 3).map(i => a(i)(3) / a(i)(i))
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val (a00, a01, a02) = (s11 * s22 - s12 * s12, -(s1 * s22 - s12 * s2),
      s1 * s12 - s11 * s2)
    val (a11, a12, a22) = (n * s22 - s2 * s2, -(n * s12 - s1 * s2),
      n * s11 - s1 * s1)
    val sse = data.map { t =>
      val e = t._5 - (beta(0) + beta(1) * t._3 + beta(2) * t._4); e * e
    }.sum
    val s2hat = sse / (n - 3)
    val localTop = data.map { t =>
      val h = (a00 + a11 * t._3 * t._3 + a22 * t._4 * t._4 + 2 * a01 * t._3 +
        2 * a02 * t._4 + 2 * a12 * t._3 * t._4) / det
      val e = t._5 - (beta(0) + beta(1) * t._3 + beta(2) * t._4)
      ((t._1, t._2), e * e / (3 * s2hat) * (h / ((1 - h) * (1 - h))))
    }.sortBy { case ((ok, ln), d) => (-d, ok, ln) }.take(20)
    assert(rows.map(r => (r._1, r._2)).toSet === localTop.map(_._1).toSet,
      "top-20 key set matches the independent solver's ranking")
    rows.zip(localTop).foreach { case (r, (_, dLocal)) =>
      assert(math.abs(r._8 - dLocal) < 1e-6 * math.max(1e-12, dLocal),
        s"Cook's D near the independent recompute (${r._8} vs $dLocal)")
    }
  }

  test("source divergence: per-source KL recomputed through both bridges, nonnegative") {
    import java.math.{BigDecimal => BD, RoundingMode}
    def bridgeLn(x: Double): Double =
      new BD(java.lang.Double.toString(math.log(x)))
        .setScale(12, RoundingMode.HALF_UP).toPlainString.toDouble
    def q12(x: Double): BD =
      new BD(java.lang.Double.toString(x)).setScale(12, RoundingMode.HALF_UP)
    val docs = graft.core.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toArray))
    val st = docs.flatMap { case (s, ts) => ts.map(t => (s, t)) }
      .groupBy(identity).map { case ((s, t), xs) => ((s, t), xs.length.toLong) }
    val ct = st.groupBy(_._1._2).map { case (t, xs) => (t, xs.values.sum) }
    val ns = st.groupBy(_._1._1).map { case (s, xs) => (s, xs.values.sum) }
    val n = ns.values.sum
    val expected = st.groupBy(_._1._1).map { case (s, cells) =>
      val kl = cells.toSeq.map { case ((_, t), cSt) =>
        val pOwn = cSt.toDouble / ns(s).toDouble
        q12(pOwn * bridgeLn(pOwn / (ct(t).toDouble / n.toDouble)))
      }.reduce(_ add _).toPlainString.toDouble
      (s, (ns(s), kl))
    }
    val rows = TermStats.sourceDivergence(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSet === expected.keySet, "every source present")
    rows.foreach { case (s, nTok, kl) =>
      assert(nTok === expected(s)._1, s"$s token total")
      assert(kl === expected(s)._2, s"$s KL through both bridges")
      assert(kl >= -1e-9, s"$s KL nonnegative (Gibbs)")
    }
  }

  test("source perplexity: entropy recomputed; e^H bridged; PP within [1, vocab]") {
    import java.math.{BigDecimal => BD, RoundingMode}
    def bridgeLn(x: Double): Double =
      new BD(java.lang.Double.toString(math.log(x)))
        .setScale(12, RoundingMode.HALF_UP).toPlainString.toDouble
    def q12(x: Double): BD =
      new BD(java.lang.Double.toString(x)).setScale(12, RoundingMode.HALF_UP)
    val docs = graft.core.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toArray))
    val expected = docs.groupBy(_._1).map { case (s, ds) =>
      val counts = ds.flatMap(_._2).groupBy(x => x)
        .map { case (_, xs) => xs.length.toLong }.toSeq
      val nS = counts.sum
      val h = -counts.map { c =>
        val p = c.toDouble / nS.toDouble
        q12(p * bridgeLn(p))
      }.reduce(_ add _).toPlainString.toDouble
      val pp = new BD(java.lang.Double.toString(math.exp(h)))
        .setScale(9, RoundingMode.HALF_UP).toPlainString.toDouble
      (s, (nS, counts.length.toLong, h, pp))
    }
    val rows = TermStats.sourcePerplexity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSet === expected.keySet)
    rows.foreach { case (s, nTok, vocab, h, pp) =>
      val (en, ev, eh, ep) = expected(s)
      assert(nTok === en, s"$s tokens")
      assert(vocab === ev, s"$s vocab")
      assert(h === eh, s"$s entropy through the bridges")
      assert(pp === ep, s"$s perplexity through the exp bridge")
      assert(pp >= 1.0 - 1e-9 && pp <= vocab.toDouble + 1e-9,
        s"$s effective vocabulary bounded by the real one")
    }
  }

  test("monthly mix psi: dense-filled cells recomputed through the ln bridge; psi >= 0") {
    import java.math.{BigDecimal => BD, RoundingMode}
    def bridgeLn(x: Double): Double =
      new BD(java.lang.Double.toString(math.log(x)))
        .setScale(12, RoundingMode.HALF_UP).toPlainString.toDouble
    def q14(x: Double): BD =
      new BD(java.lang.Double.toString(x)).setScale(14, RoundingMode.HALF_UP)
    val orders = graft.core.Tables.orders(spark, sf)
      .selectExpr("CAST(date_trunc('month', o_orderdate) AS DATE) AS m", "o_orderpriority")
      .collect().map(r => (r.getDate(0).toString, r.getString(1)))
    val pris = orders.groupBy(_._2).map { case (p, xs) => (p, xs.length.toLong) }
    val nTotal = orders.length.toLong
    val k = pris.size.toLong
    val rows = Statistics.monthlyMixPsi(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2)))
    val byMonth = orders.groupBy(_._1)
    assert(rows.map(_._1).toSet === byMonth.keySet)
    rows.foreach { case (m, nOrders, psi) =>
      val cells = byMonth(m).groupBy(_._2).map { case (p, xs) => (p, xs.length.toLong) }
      val nM = byMonth(m).length.toLong
      assert(nOrders === nM, s"$m order count")
      val expected = pris.toSeq.map { case (p, nP) =>
        val pCur = (cells.getOrElse(p, 0L) + 1L).toDouble / (nM + k)
        val pRef = (nP + 1L).toDouble / (nTotal + k)
        q14((pCur - pRef) * bridgeLn(pCur / pRef))
      }.reduce(_ add _).toPlainString.toDouble
      assert(psi === expected, s"$m PSI through the bridges")
      assert(psi >= -1e-12, s"$m PSI nonnegative (same-sign terms)")
    }
  }

  test("brand hhi: shares recomputed from exact cents; hhi bounded by [1/n, 1]") {
    import java.math.{BigDecimal => BD, RoundingMode}
    def q12(x: Double): BD =
      new BD(java.lang.Double.toString(x)).setScale(12, RoundingMode.HALF_UP)
    val nationRegion = graft.core.Tables.nation(spark, sf)
      .selectExpr("CAST(n_nationkey AS BIGINT)", "CAST(n_regionkey AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val regionName = graft.core.Tables.region(spark, sf)
      .selectExpr("CAST(r_regionkey AS BIGINT)", "r_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val suppNation = graft.core.Tables.supplier(spark, sf)
      .selectExpr("CAST(s_suppkey AS BIGINT)", "CAST(s_nationkey AS BIGINT)").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val partBrand = graft.core.Tables.part(spark, sf)
      .selectExpr("CAST(p_partkey AS BIGINT)", "p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val cells = graft.core.Tables.lineitem(spark, sf)
      .selectExpr("CAST(l_partkey AS BIGINT)", "CAST(l_suppkey AS BIGINT)",
        "l_extendedprice").collect()
      .map { r =>
        val cents = (BigDecimal(r.getDouble(2))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
        ((regionName(nationRegion(suppNation(r.getLong(1)))),
          partBrand(r.getLong(0))), BigInt(cents))
      }.groupBy(_._1).map { case (key, xs) => (key, xs.map(_._2).sum) }
    val rows = Statistics.brandHhi(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val byRegion = cells.groupBy(_._1._1)
    assert(rows.map(_._1).toSet === byRegion.keySet)
    rows.foreach { case (reg, nBrands, hhi) =>
      val revs = byRegion(reg).values.toSeq
      assert(nBrands === revs.length.toLong, s"$reg brand count")
      val tot = revs.sum
      val expected = revs.map { rev =>
        val share = rev.toString.toDouble / tot.toString.toDouble
        q12(share * share)
      }.reduce(_ add _).toPlainString.toDouble
      assert(hhi === expected, s"$reg HHI through the bridges")
      assert(hhi >= 1.0 / nBrands.toDouble - 1e-9 && hhi <= 1.0 + 1e-9,
        s"$reg HHI in [1/n, 1]")
    }
  }

  test("vocab jaccard: exact set intersections recomputed for every source pair") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toSet))
    val vocab = docs.groupBy(_._1).map { case (s, ds) =>
      (s, ds.map(_._2).reduce(_ ++ _)) }
    val rows = TermStats.sourceVocabJaccard(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val sources = vocab.keys.toSeq.sorted
    val expectedPairs = (for {
      a <- sources; b <- sources if a < b
      common = (vocab(a) & vocab(b)).size.toLong if common > 0
    } yield ((a, b), common)).toMap
    assert(rows.map(r => (r._1, r._2)).toSet === expectedPairs.keySet,
      "every overlapping pair present once")
    rows.foreach { case (a, b, va, vb, common, j) =>
      assert(va === vocab(a).size.toLong, s"$a vocab size")
      assert(vb === vocab(b).size.toLong, s"$b vocab size")
      assert(common === expectedPairs((a, b)), s"($a,$b) intersection")
      assert(j === common.toDouble / (va + vb - common).toDouble)
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("order-size vmr: the exact-integer identity recomputed from per-order counts") {
    val ks = graft.core.Tables.lineitem(spark, sf)
      .select("l_orderkey").collect().map(_.getLong(0))
      .groupBy(x => x).map { case (_, xs) => xs.length.toLong }.toSeq
    val nOrders = graft.core.Tables.orders(spark, sf).count()
    val (t, s2) = (ks.sum, ks.map(k => k * k).sum)
    val row = Statistics.orderSizeVmr(spark, sf).collect().head
    assert(row.getLong(0) === nOrders)
    assert(row.getLong(1) === ks.length.toLong)
    assert(row.getLong(2) === t, "line total")
    assert(row.getDouble(3) === t.toDouble / nOrders.toDouble)
    assert(row.getDouble(4) ===
      (nOrders * s2 - t * t).toDouble / (nOrders * t).toDouble, "VMR identity")
    assert(row.getDouble(4) >= 0.0)
  }

  test("good-turing coverage: spectrum counts recomputed; coverage identity holds") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toArray))
    val expected = docs.groupBy(_._1).map { case (s, ds) =>
      val counts = ds.flatMap(_._2).groupBy(x => x)
        .map { case (_, xs) => xs.length.toLong }.toSeq
      (s, (counts.sum, counts.length.toLong,
        counts.count(_ == 1L).toLong, counts.count(_ == 2L).toLong))
    }
    val rows = TermStats.goodTuringCoverage(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._1).toSet === expected.keySet)
    rows.foreach { case (s, n, v, h, d2, cov) =>
      val (en, ev, eh, ed) = expected(s)
      assert((n, v, h, d2) === ((en, ev, eh, ed)), s"$s spectrum counts")
      assert(cov === 1.0 - h.toDouble / n.toDouble, s"$s coverage identity")
      assert(cov >= 0.0 && cov <= 1.0)
    }
  }

  test("frequency spectrum: buckets partition the vocabulary, shares sum to one") {
    val counts = graft.core.Tables.documents(spark, sf)
      .select("text").collect()
      .flatMap(r => "[a-z0-9]+".r.findAllIn(r.getString(0).toLowerCase))
      .groupBy(x => x).map { case (_, xs) => xs.length.toLong }.toSeq
    val vocab = counts.length.toLong
    val expected = counts.map(c => math.min(c, 11L)).groupBy(x => x)
      .map { case (k, xs) => (k, xs.length.toLong) }
    val rows = TermStats.frequencySpectrum(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSet === expected.keySet)
    assert(rows.map(_._2).sum === vocab, "buckets partition the vocabulary")
    rows.foreach { case (k, n, v, share) =>
      assert(n === expected(k), s"bucket $k count")
      assert(v === vocab)
      assert(share === n.toDouble / vocab.toDouble)
    }
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12, "shares sum to 1")
  }

  test("order gaps: per-segment moments recomputed; burstiness bounded") {
    val orders = graft.core.Tables.orders(spark, sf)
      .selectExpr("o_custkey", "CAST(o_orderdate AS DATE) AS day", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val seg = graft.core.Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val gaps = orders.groupBy(_._1).toSeq.flatMap { case (ck, os) =>
      val sorted = os.sortBy(o => (o._2.toEpochDay, o._3))
      sorted.drop(1).zip(sorted.dropRight(1)).map { case (b, a) =>
        (seg(ck), b._2.toEpochDay - a._2.toEpochDay)
      }
    }
    val rows = TimeSeries.orderGapProfile(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val bySeg = gaps.groupBy(_._1)
    assert(rows.map(_._1).toSet === bySeg.keySet)
    rows.foreach { case (s, n, mean, sd, cv, b) =>
      val gs = bySeg(s).map(_._2)
      assert(n === gs.length.toLong, s"$s gap count")
      val (sg, sgg) = (gs.sum, gs.map(g => BigInt(g) * g).sum)
      val mu = sg.toDouble / n.toDouble
      val sigma = math.sqrt((BigInt(n) * sgg - BigInt(sg) * sg).toString.toDouble) / n.toDouble
      assert(mean === mu, s"$s mean")
      assert(sd === sigma, s"$s sd")
      assert(cv === sigma / mu, s"$s cv")
      assert(b === (sigma - mu) / (sigma + mu), s"$s burstiness")
      assert(b > -1.0 && b < 1.0)
    }
  }

  test("term burstiness: VMR recomputed exactly from raw per-doc counts") {
    val rows = TermStats.termBurstiness(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty && rows.length <= 50)
    val docs = graft.core.Tables.documents(spark, sf)
      .select("text").collect()
      .map(r => "[a-z0-9]+".r.findAllIn(r.getString(0).toLowerCase).toArray)
    val nDocs = docs.length.toLong
    val expected = docs.flatMap(_.groupBy(identity)
        .map { case (t, xs) => (t, xs.length.toLong) })
      .groupBy(_._1).toSeq.collect { case (t, xs) if xs.length >= 5 =>
        val tfs = xs.map(_._2)
        val (tt, s2) = (tfs.sum, tfs.map(v => v * v).sum)
        // the op's exact-integer identity: VMR = (N·S − T²)/(N·T)
        (t, tfs.length.toLong, tt, nDocs,
          (nDocs * s2 - tt * tt).toDouble / (nDocs * tt).toDouble)
      }.sortBy(x => (-x._5, x._1)).take(50)
    assert(rows.toSeq === expected,
      "top-50 by VMR matches the driver recompute, order and values exact")
    // burstiness sanity: every retained VMR is ≥ the Poisson floor would
    // be meaningless (terms can be under-dispersed); but df ≥ 5 must hold
    assert(rows.forall(_._2 >= 5L), "min-df gate")
  }
}
