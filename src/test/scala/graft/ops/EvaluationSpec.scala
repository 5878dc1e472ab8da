package graft.ops

import graft.SparkSpec

/** Invariant checks for the model-evaluation tier (q235 ROC-AUC, q236
  * calibration). The oracle gate pins exact values at sf0.01; these pin the
  * mathematics: AUC must equal the O(n₁·n₂) pairwise concordance definition
  * it was derived from, and the calibration table must partition the corpus
  * with each bin's mean inside the bin's own interval.
  */
class EvaluationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("roc auc: equals the pairwise concordance recompute on a micro-fixture") {
    import spark.implicits._
    val d = tmpDir("aucmicro")
    // stopword-dense English rows score high, consonant noise scores low,
    // and two docs share IDENTICAL text across labels to force a TIE pair
    // (the ½-credit branch of the Mann–Whitney identity)
    val tie = "the of and to in it was that for as with on at by this"
    val docs = Seq(
      (1L, "the and is to of a in that it was for on are with as the of and", "en"),
      (2L, "the cat sat on the mat and it was a good day for all of us there", "en"),
      (3L, tie, "en"),
      (4L, tie, "de"),
      (5L, "zrk qwv xxj plm brr ttk wqp zzf mmv hkj", "de"),
      (6L, "krz vvw jjq ppl rrn kkt qpw ffz vmm jhk lpo", "fr"))
      .map { case (id, t, l) => (id, t, l, t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = Evaluation.rocAuc(spark, d).collect().head
    val (nPos, nNeg, auc) = (r.getLong(0), r.getLong(1), r.getDouble(3))
    assert(nPos === 3 && nNeg === 3)
    // concordance recompute from the same scores: 2U = Σ (2·[s⁺>s⁻] + [s⁺=s⁻])
    val scores = Curation.qualityClassifier(spark, d)
      .join(graft.core.Tables.documents(spark, d).select($"doc_id", $"lang"), "doc_id")
      .collect().map(x => (x.getDouble(1), x.getAs[String]("lang") == "en"))
    val pos = scores.filter(_._2).map(_._1)
    val neg = scores.filterNot(_._2).map(_._1)
    val u2 = (for { p <- pos; n <- neg } yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    assert(u2 % 2 === 1, "the engineered tie pair must contribute its half")
    assert(auc === u2.toDouble / (2.0 * pos.length * neg.length),
      "Mann-Whitney AUC must equal the pairwise definition exactly")
  }

  test("roc auc: bounded, gini identity, pair accounting exact at sf0.001") {
    val r = Evaluation.rocAuc(spark, sf).collect().head
    val (nPos, nNeg) = (r.getLong(0), r.getLong(1))
    val (auc, gini) = (r.getDouble(3), r.getDouble(4))
    assert(nPos > 0 && nNeg > 0)
    assert(nPos + nNeg === graft.core.Tables.documents(spark, sf).count())
    assert(auc >= 0.0 && auc <= 1.0)
    assert(gini === 2.0 * auc - 1.0)
    // auc_num2 counts every (pos, neg) pair 0, 1 or 2 — never more
    assert(r.getLong(2) >= 0L && r.getLong(2) <= 2L * nPos * nNeg)
  }

  test("auc by segment: segments partition the corpus, per-segment pair accounting") {
    val rows = Evaluation.rocAucBySegment(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length === rows.length, "one row per segment")
    assert(rows.map(x => x._2 + x._3).sum ===
      graft.core.Tables.documents(spark, sf).count(),
      "segment class counts partition all documents")
    // the global q235 positives are exactly the segment positives' sum
    val global = Evaluation.rocAuc(spark, sf).collect().head
    assert(rows.map(_._2).sum === global.getLong(0))
    assert(rows.map(_._3).sum === global.getLong(1))
    rows.foreach { case (seg, nPos, nNeg, num2, auc) =>
      assert(num2 >= 0L && num2 <= 2L * nPos * nNeg, s"$seg pair accounting")
      if (nPos > 0 && nNeg > 0) {
        assert(auc.isDefined && auc.get >= 0.0 && auc.get <= 1.0, seg)
        assert(auc.get === num2.toDouble / (2.0 * nPos * nNeg), seg)
      } else assert(auc.isEmpty, s"$seg: single-class segment must yield NULL auc")
    }
  }

  test("threshold metrics: constant class totals, monotone counts, exact ratios") {
    val rows = Evaluation.thresholdMetrics(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)),
        if (r.isNullAt(7)) None else Some(r.getDouble(7))))
      .sortBy(_._1)
    assert(rows.length === 9)
    assert(rows.map(_._1) === (1 to 9).map(_ / 10.0))
    val nPos = rows.head._2 + rows.head._4 // tp + fn
    val nNeg = rows.head._3 + rows.head._5 // fp + tn
    rows.foreach { case (_, tp, fp, fn, tn, p, r, f1) =>
      assert(tp + fn === nPos, "positives conserved at every threshold")
      assert(fp + tn === nNeg, "negatives conserved at every threshold")
      if (tp + fp > 0) assert(p.get === tp.toDouble / (tp + fp)) else assert(p.isEmpty)
      assert(r.get === tp.toDouble / nPos)
      if (2 * tp + fp + fn > 0)
        assert(f1.get === (2.0 * tp) / (2 * tp + fp + fn))
    }
    // raising the threshold can only shrink the predicted-positive set
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2, "tp monotone non-increasing")
      assert(b._3 <= a._3, "fp monotone non-increasing")
    case _ => ()
    }
  }

  test("calibration: bins partition the corpus, means bracket their bins") {
    val rows = Evaluation.calibrationBins(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length === rows.length, "one row per bin")
    rows.foreach { case (bin, n, nPos, avg, rate, brier) =>
      assert(bin >= 0 && bin <= 9)
      assert(n > 0 && nPos >= 0 && nPos <= n)
      // a bin's mean score lies inside the bin's own interval (bin 9 is
      // closed at 1.0 — score 1.0 is clamped in)
      assert(avg >= bin / 10.0 && avg <= (bin + 1) / 10.0,
        s"bin $bin mean $avg escapes its interval")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(brier >= 0.0 && brier <= 1.0 + 1e-12)
    }
    val docs = graft.core.Tables.documents(spark, sf)
    assert(rows.map(_._2).sum === docs.count(), "bins partition all predictions")
    assert(rows.map(_._3).sum ===
      docs.filter(org.apache.spark.sql.functions.col("lang") === "en").count(),
      "positives partition to the English count")
  }

  test("calibration drift: sources partition the corpus, ECE bounded by max gap") {
    val rows = Evaluation.calibrationBySource(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length === rows.length, "one row per source")
    rows.foreach { case (src, n, ece, maxGap) =>
      assert(n > 0, s"source $src empty")
      // ECE is a convex combination of per-bin gaps: 0 ≤ ECE ≤ max gap ≤ 1
      assert(ece >= 0.0 && ece <= maxGap + 1e-12,
        s"source $src: ece $ece escapes [0, max_gap $maxGap]")
      assert(maxGap >= 0.0 && maxGap <= 1.0)
    }
    assert(rows.map(_._2).sum === graft.core.Tables.documents(spark, sf).count(),
      "source groups partition all documents")
  }

  test("mcnemar: cells partition the corpus; chi2 is the discordant identity") {
    val row = Evaluation.mcnemar(spark, sf).collect().head
    val n = row.getLong(0); val bothC = row.getLong(1)
    val onlyA = row.getLong(2); val onlyB = row.getLong(3); val bothW = row.getLong(4)
    assert(bothC + onlyA + onlyB + bothW === n, "four cells partition the docs")
    assert(n === graft.core.Tables.documents(spark, sf).count())
    // independent recompute of the discordant cells from the two classifiers
    val a = TextAnalysis.langId(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(7) == "en")).toMap
    val truth = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).contains("en"))).toMap
    val b = Curation.qualityClassifier(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1) >= 0.5)).toMap
    var oa = 0L; var ob = 0L
    truth.foreach { case (id, y) =>
      val ca = a(id) == y; val cb = b(id) == y
      if (ca && !cb) oa += 1
      if (!ca && cb) ob += 1
    }
    assert(onlyA === oa, "A-right-B-wrong count")
    assert(onlyB === ob, "B-right-A-wrong count")
    if (oa + ob > 0) {
      val chi2 = (math.abs(oa - ob) - 1.0) * (math.abs(oa - ob) - 1.0) / (oa + ob)
      assert(math.abs(row.getDouble(5) - chi2) < 1e-12 * math.max(1.0, chi2))
      assert(row.getBoolean(6) === (row.getDouble(5) > 3.841))
    }
  }

  test("decile lift: partitions the corpus, last cumulative lift is exactly 1") {
    val rows = Evaluation.decileLift(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).sortBy(_._1)
    assert(rows.nonEmpty && rows.length <= 10)
    val total = graft.core.Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum === total, "deciles partition all docs")
    assert(rows.last._4 === total, "cumulative n ends at the corpus size")
    assert(rows.last._6 === 1.0, "final cumulative lift is exactly 1.0")
    // cumulative columns are consistent prefix sums; each lift is the
    // exact single-division identity over them
    val posTotal = rows.map(_._3).sum
    var cn = 0L; var cp = 0L
    rows.foreach { case (_, nr, np, cumN, cumP, lift) =>
      cn += nr; cp += np
      assert(cumN === cn && cumP === cp, "prefix sums")
      assert(lift === (cumP * total).toDouble / (cumN * posTotal).toDouble,
        "lift is one exact-product division")
    }
  }

  test("classifier KS: equals the max CDF gap recomputed from sorted scores") {
    val row = Evaluation.classifierKs(spark, sf).collect().head
    val scored = Curation.qualityClassifier(spark, sf)
      .select("doc_id", "score").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val en = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).contains("en"))).toMap
    val xs = scored.map { case (id, s) => (s, en(id)) }.sortBy(_._1)
    val n1 = xs.count(_._2).toLong; val n2 = xs.length - n1
    var c1 = 0L; var c2 = 0L; var best = 0L; var bestX = Double.MaxValue
    xs.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (x, g) =>
      c1 += g.count(_._2); c2 += g.count(!_._2)
      val dn = math.abs(c1 * n2 - c2 * n1)
      if (dn > best) { best = dn; bestX = x }
      else if (dn == best && x < bestX) bestX = x
    }
    assert(row.getLong(0) === n1)
    assert(row.getLong(1) === n2)
    assert(row.getLong(2) === best, "exact integer KS numerator")
    assert(row.getDouble(3) === best.toDouble / (n1.toDouble * n2.toDouble))
    assert(row.getDouble(4) === bestX, "threshold is the smallest argmax score")
  }

  test("cohen's kappa: recomputed from q220's own confusion matrix") {
    val row = Evaluation.cohensKappa(spark, sf).collect().head
    // rebuild the margins from the (independently oracle-gated) q220 cells
    val cells = TextAnalysis.langConfusion(spark, sf).collect()
      .map(r => (Option(r.getString(0)).getOrElse("(null)"), r.getString(1),
        r.getLong(2)))
    val n = cells.map(_._3).sum
    val diag = cells.filter(c => c._1 == c._2).map(_._3).sum
    val rowT = cells.groupBy(_._1).map { case (t, cs) => (t, cs.map(_._3).sum) }
    val colT = cells.groupBy(_._2).map { case (g, cs) => (g, cs.map(_._3).sum) }
    val peNum = rowT.map { case (t, r) => r * colT.getOrElse(t, 0L) }.sum
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === diag, "diagonal agreement")
    assert(row.getLong(2) === peNum, "chance-agreement numerator")
    val kappa = (n * diag - peNum).toDouble / (n * n - peNum).toDouble
    assert(row.getDouble(5) === kappa, "kappa is the single exact division")
    assert(kappa <= 1.0, "kappa bounded above by 1")
    // po and pe reconcile with kappa: κ = (po − pe)/(1 − pe)
    val po = row.getDouble(3); val pe = row.getDouble(4)
    assert(math.abs((po - pe) / (1.0 - pe) - kappa) < 1e-12)
  }

  test("info gain: entropies recomputed through the 12-decimal bridge, gain bounded") {
    import java.math.{BigDecimal => BD, RoundingMode}
    // driver mirror of the house bridges: ln quantized to 12 decimals then
    // back to double; each cell term quantized to 12 decimals before the
    // exact decimal fold; the folded sum crosses back via toString
    def lnB(x: Double): Double =
      new BD(java.lang.Double.toString(math.log(x)))
        .setScale(12, RoundingMode.HALF_UP).toPlainString.toDouble
    def q12(x: Double): BD =
      new BD(java.lang.Double.toString(x)).setScale(12, RoundingMode.HALF_UP)
    val base = graft.core.Tables.documents(spark, sf)
      .selectExpr(
        "CASE WHEN n_chars < 200 THEN 'short' WHEN n_chars < 400 THEN 'medium' ELSE 'long' END AS band",
        "source", "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    val n = base.length.toDouble
    def entropy(cells: Map[(String, Int), Long]): Double = {
      val vTot = cells.groupBy(_._1._1).map { case (v, cs) => (v, cs.values.sum) }
      val folded = cells.toSeq.map { case ((v, _), cVy) =>
        q12((cVy / n) * lnB(cVy.toDouble / vTot(v).toDouble))
      }.reduce(_ add _)
      -folded.toPlainString.toDouble
    }
    val hY = entropy(base.groupBy(d => ("all", d._3))
      .map { case (k, ds) => (k, ds.length.toLong) })
    val hBand = entropy(base.groupBy(d => (d._1, d._3))
      .map { case (k, ds) => (k, ds.length.toLong) })
    val hSrc = entropy(base.groupBy(d => (d._2, d._3))
      .map { case (k, ds) => (k, ds.length.toLong) })
    val rows = Evaluation.infoGain(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1).toList
    assert(rows.map(_._1) === List("length_band", "source"))
    rows.foreach { case (f, hy, hyg, ig) =>
      assert(hy === hY, s"$f: marginal entropy")
      assert(ig === hy - hyg, s"$f: gain is the plain difference")
      val expected = if (f == "source") hSrc else hBand
      assert(math.abs(hyg - expected) < 1e-12, s"$f: conditional entropy")
      // conditioning never increases entropy (up to bridge rounding)
      assert(ig >= -1e-9 && ig <= hy + 1e-9, s"$f: gain in [0, H(y)]")
    }
  }

  test("point-biserial: exact-moment identity recomputed; r bounded") {
    val row = Evaluation.pointBiserial(spark, sf).collect().head
    val docs = graft.core.Tables.documents(spark, sf)
      .selectExpr("CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y",
        "CAST(n_chars AS BIGINT) AS x")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val n = docs.length.toLong
    val n1 = docs.count(_._1 == 1).toLong
    val sx = docs.map(_._2).sum
    val s1 = docs.collect { case (1, x) => x }.sum
    val q = docs.map(d => BigInt(d._2) * d._2).sum
    val num = BigInt(n) * s1 - BigInt(n1) * sx
    val r = num.toString.toDouble /
      (math.sqrt(n1.toDouble * (n - n1).toDouble) *
        math.sqrt((BigInt(n) * q - BigInt(sx) * sx).toString.toDouble))
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === n1)
    assert(row.getLong(2) === n - n1)
    assert(row.getDouble(3) === s1.toDouble / n1.toDouble, "en mean")
    assert(row.getDouble(4) === (sx - s1).toDouble / (n - n1).toDouble)
    assert(row.getDouble(5) === r, "r is the one fixed tree")
    assert(r >= -1.0 && r <= 1.0)
  }

  test("cochran's q: recomputed from the three detectors' own outputs") {
    val guesses = TextAnalysis.langId(spark, sf)
      .select("doc_id", "guessed_lang").collect()
      .map(r => (r.getLong(0), r.getString(1) == "en")).toMap
    val scores = Curation.qualityClassifier(spark, sf)
      .select("doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getDouble(1) >= 0.5)).toMap
    val rows = graft.core.Tables.documents(spark, sf)
      .selectExpr("doc_id", "CAST(n_chars AS BIGINT) AS x").collect()
      .map { r =>
        val id = r.getLong(0)
        (if (guesses(id)) 1L else 0L, if (scores(id)) 1L else 0L,
          if (r.getLong(1) >= 300L) 1L else 0L)
      }
    val (ga, gb, gc) = (rows.map(_._1).sum, rows.map(_._2).sum, rows.map(_._3).sum)
    val ls = rows.map(t => t._1 + t._2 + t._3)
    val (sl, sll) = (ls.sum, ls.map(l => l * l).sum)
    val num = 2L * (3L * (ga * ga + gb * gb + gc * gc) -
      (ga + gb + gc) * (ga + gb + gc))
    val den = 3L * sl - sll
    val row = Evaluation.cochransQ(spark, sf).collect().head
    assert(row.getLong(0) === rows.length.toLong)
    assert(row.getLong(1) === ga, "langid positives")
    assert(row.getLong(2) === gb, "classifier positives")
    assert(row.getLong(3) === gc, "length-baseline positives")
    assert(den > 0L, "the corpus is non-degenerate")
    assert(row.getDouble(4) === num.toDouble / den.toDouble, "Q one division")
    assert(row.getLong(5) === 2L)
    assert(row.getDouble(4) >= 0.0)
  }

  test("hosmer-lemeshow: recomputed from the scored corpus through both bridges") {
    import java.math.{BigDecimal => BD, RoundingMode}
    def q12(x: Double): BD =
      new BD(java.lang.Double.toString(x)).setScale(12, RoundingMode.HALF_UP)
    val labels = graft.core.Tables.documents(spark, sf)
      .selectExpr("doc_id", "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val scored = Curation.qualityClassifier(spark, sf)
      .select("doc_id", "score").collect()
      .map(r => (math.min(math.floor(r.getDouble(1) * 10).toLong, 9L),
        r.getDouble(1), labels(r.getLong(0))))
    val byBin = scored.groupBy(_._1).toSeq.map { case (bin, xs) =>
      val n = xs.length.toLong
      val o1 = xs.count(_._3 == 1).toLong
      val e1 = xs.map(x => q12(x._2)).reduce(_ add _).toPlainString.toDouble
      (bin, n, o1, e1)
    }
    val usable = byBin.filter { case (_, n, _, e1) => e1 > 0.0 && n - e1 > 0.0 }
    val hl = usable.map { case (_, n, o1, e1) =>
      val e0 = n.toDouble - e1
      val d1 = o1.toDouble - e1
      val d0 = (n - o1).toDouble - e0
      q12(d1 * d1 / e1 + d0 * d0 / e0)
    }.reduce(_ add _).toPlainString.toDouble
    val row = Evaluation.hosmerLemeshow(spark, sf).collect().head
    assert(row.getLong(0) === byBin.length.toLong, "bin count")
    assert(row.getLong(1) === usable.length.toLong, "usable bins")
    assert(row.getDouble(2) === hl, "HL statistic through both bridges")
    assert(row.getLong(3) === usable.length.toLong - 2L)
    assert(hl >= 0.0)
  }
}
