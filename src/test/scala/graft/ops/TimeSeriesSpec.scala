package graft.ops

import org.apache.spark.sql.functions.{col, to_date}

import graft.SparkSpec

/** Invariants for the time-series tier — driver recomputes of each statistic
  * from the raw series at the tiny scale, plus the structural identities.
  */
class TimeSeriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The daily cents series, driver-side, in day order. */
  private def series(): Array[Long] =
    graft.core.Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
      .collect()
      .groupBy(_.getDate(0).toLocalDate)
      .toSeq.sortBy(_._1)(Ordering.by(_.toEpochDay))
      .map(_._2.map(r => (BigDecimal(r.getDouble(1))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact).sum)
      .toArray

  test("acf: matches the exact driver recompute, |r| <= 1") {
    val xs = series()
    val n = xs.length.toLong
    val s = xs.sum
    val dev = xs.map(x => BigInt(n * x - s))
    val den = dev.map(d => d * d).sum
    val rows = TimeSeries.revenueAcf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).sorted.sameElements(1L to 7L))
    rows.foreach { case (lag, nPairs, acf) =>
      assert(nPairs === n - lag)
      val num = (0 until (xs.length - lag.toInt))
        .map(t => dev(t) * dev(t + lag.toInt)).sum
      val expect = BigDecimal(num).toDouble / BigDecimal(den).toDouble
      assert(math.abs(acf - expect) < 1e-12, s"lag $lag")
      assert(math.abs(acf) <= 1.0)
    }
  }

  test("ewma: n_terms ramps to the window, value matches the quantized convolution") {
    val xs = series()
    val rows = TimeSeries.ewmaRevenue(spark, sf).collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1.toLocalDate)(Ordering.by(_.toEpochDay))
    assert(rows.length === xs.length)
    rows.zipWithIndex.foreach { case ((_, total, nTerms, ewma, norm), t) =>
      assert(total === xs(t))
      assert(nTerms === math.min(t + 1, 40).toLong, s"day $t ramp")
      // defined-operator recompute: quantize each exact term to 12 dp, fold
      val expect = (0 until math.min(t + 1, 40)).map { j =>
        BigDecimal(xs(t - j).toDouble / (1L << (j + 1)))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      assert(math.abs(ewma - expect.toDouble) < 1e-9, s"day $t ewma")
      // normalized value sits within the window's value range
      val window = (0 until math.min(t + 1, 40)).map(j => xs(t - j))
      assert(norm >= window.min.toDouble - 1e-6 && norm <= window.max.toDouble + 1e-6)
    }
  }

  test("burstiness: one user recomputed; B in (-1,1) and consistent with CV") {
    val rows = TimeSeries.userBurstiness(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nGaps, mean, sd, cv, b) =>
      assert(nGaps >= 2 && mean > 0 && sd >= 0)
      assert(b > -1.0 && b < 1.0)
      assert(math.abs(b - (cv - 1.0) / (cv + 1.0)) < 1e-12, "B = (CV-1)/(CV+1)")
    }
    // recompute the first user's gaps exactly
    val (uid, nGaps, mean, _, _, _) = rows.head
    val ts = graft.core.Tables.events(spark, sf)
      .filter(col("user_id") === uid)
      .select(col("ts"), col("event_id")).collect()
      .map { r =>
        val t = r.getAs[java.time.LocalDateTime](0).toInstant(java.time.ZoneOffset.UTC)
        (t.getEpochSecond * 1000000L + t.getNano / 1000L, r.getLong(1))
      }
      .sorted.map(_._1)
    val gaps = ts.sliding(2).map { case Array(a, b) => b - a }.toArray
    assert(gaps.length.toLong === nGaps)
    assert(math.abs(mean - gaps.sum.toDouble / gaps.length) < 1e-6)
  }

  test("theil-sen: median slope recomputed exactly from all pairs") {
    val xs = series()
    // rebuild (day-number, cents) with the same anchor the operator uses
    val days = graft.core.Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate")).as("day")).distinct().collect()
      .map(_.getDate(0).toLocalDate.toEpochDay - java.time.LocalDate.parse("1990-01-01").toEpochDay)
      .sorted
    val pts = days.zip(xs)
    val slopes = (for {
      i <- pts.indices; j <- (i + 1) until pts.length
    } yield ((pts(i)._1 * 100000L + pts(j)._1),
      (pts(j)._2 - pts(i)._2).toDouble / (pts(j)._1 - pts(i)._1).toDouble)).toArray
    val n = slopes.length.toLong
    val sorted = slopes.sortBy(t => (t._2, t._1))
    val expect = sorted(((n + 1) / 2 - 1).toInt)._2
    val r = TimeSeries.theilSen(spark, sf).collect().head
    assert(r.getLong(0) === n, "pair count")
    assert(r.getDouble(1) === expect, "median slope exact")
  }

  test("kaplan-meier: survival monotone from 1-ish to >=0, risk sets telescope") {
    val rows = TimeSeries.kaplanMeier(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    val nCust = graft.core.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.head._2 === nCust, "initial risk set is every customer")
    assert(rows.map(t => t._3 + t._4).sum === nCust, "events + censored partition subjects")
    // risk sets telescope: n_risk(t) = n_risk(next) + d + c
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._2 === b._2 + a._3 + a._4, s"telescope at t=${a._1}")
      case _ =>
    }
    assert(rows.map(_._5).sliding(2).forall { case Array(a, b) => b <= a + 1e-12; case _ => true },
      "survival nonincreasing")
    assert(rows.forall(t => t._5 >= 0.0 && t._5 <= 1.0))
    // driver recompute of the product-limit at the final time
    val prod = rows.foldLeft(1.0) { case (s, (_, r, d, _, _)) =>
      if (d > 0 && d < r) s * (1.0 - d.toDouble / r) else if (d == r) 0.0 else s
    }
    assert(math.abs(rows.last._5 - prod) < 1e-6, "final survival near the naive product")
  }

  test("forecast backtest: forecast is yesterday's smoothed value, errors fold") {
    val ew = TimeSeries.ewmaRevenue(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getDouble(4)))
      .sortBy(_._1)(Ordering.by(_.toEpochDay))
    val rows = TimeSeries.forecastBacktest(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._2).sum === ew.length - 1L, "every day after the first is scored")
    rows.foreach { case (m, nd, mae, rmse, mape) =>
      assert(nd > 0 && mae >= 0 && rmse >= 0 && mape >= 0, s"$m")
    }
    // recompute one month's MAE from the smoother's own outputs
    val first = rows.minBy(_._1)(Ordering.by(_.toEpochDay))
    val scored = ew.sliding(2).collect {
      case Array((_, _, f), (d2, x2, _))
        if d2.getYear == first._1.getYear && d2.getMonth == first._1.getMonth =>
        math.abs(x2.toDouble - f)
    }.toArray
    assert(scored.length.toLong === first._2)
    assert(math.abs(scored.sum / scored.length - first._3) < 1e-6, "month MAE recompute")
  }

  test("conformal: qhat is the rank-selected residual, coverage counts exact") {
    val ew = TimeSeries.ewmaRevenue(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getDouble(4)))
      .sortBy(_._1)(Ordering.by(_.toEpochDay))
    val errs = ew.sliding(2).collect {
      case Array((_, _, f), (d2, x2, _)) => (d2, math.abs(x2.toDouble - f))
    }.toArray
    val cut = java.time.LocalDate.parse("1999-01-01")
    val (cal, test) = errs.partition(_._1.isBefore(cut))
    val sortedCal = cal.sortBy(t => (t._2, t._1.toEpochDay))
    val k = math.min(math.ceil((cal.length + 1) * 0.9).toLong, cal.length.toLong)
    val qhat = sortedCal((k - 1).toInt)._2
    val covered = test.count(_._2 <= qhat).toLong
    val r = TimeSeries.conformalForecast(spark, sf).collect().head
    assert(r.getLong(0) === cal.length.toLong, "n_cal")
    assert(r.getLong(1) === test.length.toLong, "n_test")
    assert(r.getDouble(2) === qhat, "qhat rank selection")
    assert(r.getLong(3) === covered, "coverage count")
    assert(r.getDouble(4) > 0.6 && r.getDouble(4) <= 1.0, "coverage sane")
    assert(r.getDouble(5) === 0.9)
  }

  test("dow seasonality: 7 rows partition the days; n-weighted index mean is 1") {
    val rows = TimeSeries.dowSeasonality(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).sorted.sameElements(0L to 6L))
    assert(rows.map(_._2).sum === series().length.toLong)
    val nAll = rows.map(_._2).sum.toDouble
    val weighted = rows.map(t => t._5 * t._2).sum / nAll
    assert(math.abs(weighted - 1.0) < 1e-9, s"weighted index mean $weighted")
    rows.foreach(t => assert(t._4 > 0 && t._5 > 0))
  }

  test("seasonal decomposition: exact recompute of trend, seasonal and residual") {
    val sf = "/root/testdata/sf0.001"
    val rows = TimeSeries.seasonalDecompose(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).sortBy(_._1)
    assert(rows.length > 10)
    val xs = rows.map(_._2)
    // trend and detrended recomputed with the operator's own trees
    val det = rows.zipWithIndex.map { case ((day, x, nw, trend, _, _, _), i) =>
      val window = xs.slice(math.max(0, i - 3), math.min(xs.length, i + 4))
      assert(nw === window.length, day)
      assert(trend === window.sum.toDouble / window.length, s"$day trend")
      x.toDouble - trend
    }
    // per-dow seasonal: the 6-decimal quantized fold over detrended values
    val seasonal = rows.map(_._5).zip(det).groupBy {
      case (dow, _) => dow
    }.map { case (dow, g) =>
      dow -> g.map(x => BigDecimal(x._2.toString)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / g.length
    }
    rows.zip(det).foreach { case ((day, _, _, _, dow, s, resid), d) =>
      assert(s === seasonal(dow), s"$day seasonal")
      assert(resid === d - s, s"$day residual")
    }
    // the decomposition reconstructs the series to FP tolerance
    rows.zip(det).foreach { case ((day, x, _, trend, _, s, resid), _) =>
      assert(math.abs(trend + s + resid - x.toDouble) < 1e-6 * math.abs(x.toDouble),
        s"$day reconstruction")
    }
  }

  test("rolling median: exact sliding-window recompute, all-integer") {
    val sf = "/root/testdata/sf0.001"
    val rows = TimeSeries.rollingMedianRevenue(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.length > 10)
    val xs = rows.map(_._2)
    rows.zipWithIndex.foreach { case ((day, _, nw, med), i) =>
      val window = xs.slice(math.max(0, i - 6), i + 1)
      assert(nw === window.length, day)
      assert(med === window.sorted.apply((window.length + 1) / 2 - 1),
        s"$day: lower median mismatch")
    }
  }

  test("nelson-aalen: hazard cumulates exactly, risk sets match kaplan-meier") {
    val sf = "/root/testdata/sf0.001"
    val rows = TimeSeries.nelsonAalen(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).sortBy(_._1)
    assert(rows.nonEmpty)
    // cumulative hazard recomputed with the operator's own quantize/fold
    var acc = BigDecimal(0)
    rows.foreach { case (t, nRisk, d, _, h, sna) =>
      acc += BigDecimal((d.toDouble / nRisk).toString)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      assert(h === acc.toDouble, s"t=$t hazard fold")
      assert(sna > 0.0 && sna <= 1.0)
    }
    assert(rows.map(_._5).sliding(2).forall {
      case Array(a, b) => b >= a; case _ => true }, "hazard monotone")
    // same risk sets as the KM estimator (shared machinery, pinned)
    val km = TimeSeries.kaplanMeier(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (t, nRisk, _, _, _, _) => assert(km(t) === nRisk, s"t=$t") }
  }

  test("mann-kendall: S, tie term and z recomputed exactly from the daily series") {
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val daily = graft.core.Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate")).as("day"),
        (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("x"))
      .orderBy("day").collect().map(r => r.getLong(1))
    var s = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length)
      s += java.lang.Long.signum(daily(j) - daily(i)).toLong
    val n = daily.length.toLong
    val tieTerm = daily.groupBy(identity).values.map(_.length.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val varNum = n * (n - 1) * (2 * n + 5) - tieTerm
    val row = TimeSeries.mannKendall(spark, sf).collect().head
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === s, "S statistic")
    assert(row.getLong(2) === varNum, "tie-corrected variance numerator")
    val varS = varNum.toDouble / 18.0
    val z = if (s > 0) (s - 1).toDouble / math.sqrt(varS)
      else if (s < 0) (s + 1).toDouble / math.sqrt(varS) else 0.0
    assert(row.getDouble(3) === z, "continuity-corrected z")
    assert(row.getBoolean(4) === (math.abs(z) > 1.96))
  }

  test("seasonal cusum: exact tabular-CUSUM recompute over q251's residuals") {
    val sf = "/root/testdata/sf0.001"
    val resid = TimeSeries.seasonalDecompose(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getDouble(6))).sortBy(_._1)
    val rows = TimeSeries.seasonalCusum(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getDouble(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1)
    assert(rows.length === resid.length, "one CUSUM row per decomposition day")
    // replay the exact-decimal fold: dev = n·q12(r) − Σq12(r), S = prefix − min(run-min, 0)
    def q12(d: Double) = BigDecimal(d.toString).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val n = BigDecimal(resid.length)
    val rt = resid.map(r => q12(r._2)).sum
    val ra = resid.map(r => q12(math.abs(r._2))).sum
    var prefix = BigDecimal(0); var runmin = BigDecimal(0)
    resid.zip(rows).foreach { case ((day, r), (day2, rOut, excess, alarm)) =>
      assert(day === day2)
      assert(rOut === r, s"$day residual passthrough")
      prefix += n * q12(r) - rt
      runmin = runmin.min(prefix)
      val s = prefix - runmin.min(0)
      assert(excess === (s.toDouble / resid.length.toDouble), s"$day excess")
      assert(alarm === (s * 10 > n * ra), s"$day alarm")
      assert(s >= 0, s"$day CUSUM statistic must be nonnegative")
    }
  }

  test("residual diagnostics: DW and runs-test replayed over q251's residuals") {
    val sf = "/root/testdata/sf0.001"
    def q12(d: Double) = BigDecimal(d.toString).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val e = TimeSeries.seasonalDecompose(spark, sf).collect()
      .map(r => (r.getDate(0).toString, q12(r.getDouble(6)))).sortBy(_._1).map(_._2)
    val row = TimeSeries.residualDiagnostics(spark, sf).collect().head
    assert(row.getLong(0) === e.length.toLong)
    def q12d(d: Double) = BigDecimal(d.toString).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val sumE2 = e.map(v => q12d(v.toDouble * v.toDouble)).sum
    val sumD2 = e.sliding(2).map { case Array(a, b) =>
      q12d((b - a).toDouble * (b - a).toDouble) }.sum
    val dw = sumD2.toDouble / sumE2.toDouble
    assert(math.abs(row.getDouble(1) - dw) < 1e-12 * dw, "Durbin-Watson")
    val signs = e.map(_.signum).filter(_ != 0)
    val nPos = signs.count(_ == 1).toLong
    val nNeg = signs.count(_ == -1).toLong
    val nRuns = 1L + signs.sliding(2).count { case Array(a, b) => a != b }
    assert(row.getLong(2) === nPos)
    assert(row.getLong(3) === nNeg)
    assert(row.getLong(4) === nRuns, "runs count")
    val nS = (nPos + nNeg).toDouble
    val mu = 2.0 * nPos * nNeg / nS + 1.0
    val z = (nRuns - mu) / math.sqrt((mu - 1.0) * (mu - 2.0) / (nS - 1.0))
    assert(math.abs(row.getDouble(6) - z) < 1e-9 * math.abs(z), "runs z")
  }

  test("cross-correlation: every lag's r recomputed from exact BigInt folds; lag 0 is Pearson") {
    val sf = "/root/testdata/sf0.001"
    val daily = graft.core.Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("o_orderdate")).as("day"),
        org.apache.spark.sql.functions.col("o_totalprice"))
      .collect()
      .groupBy(_.getDate(0).toLocalDate.toEpochDay)
      .map { case (dn, rs) =>
        (dn, rs.map(r => (BigDecimal(r.getDouble(1).toString).setScale(2) * 100)
          .toLongExact).sum, rs.length.toLong)
      }.toArray.sortBy(_._1)
    val n = daily.length
    val sx = daily.map(d => BigInt(d._2)).sum
    val sy = daily.map(d => BigInt(d._3)).sum
    val dev = daily.map { case (dn, x, y) => (dn, BigInt(n) * x - sx, BigInt(n) * y - sy) }
    val dax = dev.map(d => d._2 * d._2).sum.toDouble
    val day_ = dev.map(d => d._3 * d._3).sum.toDouble
    val byDn = dev.map(d => (d._1, d)).toMap
    val rows = TimeSeries.crossCorrelation(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.length === 15)
    rows.foreach { case (lag, nPairs, r) =>
      val pairs = dev.flatMap(a => byDn.get(a._1 + lag).map(b => (a, b)))
      assert(nPairs === pairs.length.toLong, s"lag $lag pair count")
      val num = pairs.map { case (a, b) => a._3 * b._2 }.sum.toDouble
      val expected = num / math.sqrt(dax * day_)
      assert(math.abs(r - expected) < 1e-12 * math.max(1.0, math.abs(expected)),
        s"lag $lag r")
      assert(r >= -1.0 && r <= 1.0, s"lag $lag r out of range")
    }
  }

  test("decomposition strength: variances recomputed from q251's own columns") {
    val sf = "/root/testdata/sf0.001"
    def q12(d: Double) = BigDecimal(d.toString).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val cols = TimeSeries.seasonalDecompose(spark, sf).collect()
      .map(r => (r.getLong(1), r.getDouble(3), r.getDouble(5), r.getDouble(6)))
    val row = TimeSeries.decompositionStrength(spark, sf).collect().head
    def popVar(vs: Array[BigDecimal]): Double = {
      val n = vs.length
      val s = vs.sum
      val ss = vs.map(v => q12(v.toDouble * v.toDouble)).sum
      (ss.toDouble - s.toDouble * s.toDouble / n) / n
    }
    val vR = popVar(cols.map(c => q12(c._4)))
    val vTr = popVar(cols.map(c => q12(c._1.toDouble - c._3)))
    val vSr = popVar(cols.map(c => q12(c._1.toDouble - c._2)))
    assert(row.getLong(0) === cols.length.toLong)
    assert(math.abs(row.getDouble(1) - vR) < 1e-9 * vR, "var(resid)")
    assert(math.abs(row.getDouble(2) - vTr) < 1e-9 * vTr, "var(deseasonalized)")
    assert(math.abs(row.getDouble(3) - vSr) < 1e-9 * vSr, "var(detrended)")
    val fT = row.getDouble(4); val fS = row.getDouble(5)
    assert(fT >= 0.0 && fT <= 1.0, "trend strength in [0,1]")
    assert(fS >= 0.0 && fS <= 1.0, "seasonal strength in [0,1]")
    // residual variance can never exceed the series it was subtracted from
    // by more than the clamp allows — strengths agree with the raw ratios
    assert(math.abs(fT - math.max(0.0, 1.0 - vR / vTr)) < 1e-12)
    assert(math.abs(fS - math.max(0.0, 1.0 - vR / vSr)) < 1e-12)
  }

  test("kendall tau-b: brute-force pair recompute, exact counts") {
    val sf = "/root/testdata/sf0.001"
    val daily = graft.core.Tables.orders(spark, sf)
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("o_orderdate")).as("day"),
        org.apache.spark.sql.functions.col("o_totalprice"))
      .collect()
      .groupBy(_.getDate(0).toLocalDate.toEpochDay)
      .map { case (dn, rs) =>
        (dn, rs.map(r => (BigDecimal(r.getDouble(1).toString).setScale(2) * 100)
          .toLongExact).sum, rs.length.toLong)
      }.toArray.sortBy(_._1)
    var s = 0L; var n1 = 0L; var n2 = 0L; var n0 = 0L
    for (i <- daily.indices; j <- (i + 1) until daily.length) {
      val a = daily(i); val b = daily(j)
      n0 += 1
      s += java.lang.Long.signum(b._2 - a._2).toLong *
        java.lang.Long.signum(b._3 - a._3)
      if (a._2 == b._2) n1 += 1
      if (a._3 == b._3) n2 += 1
    }
    val row = TimeSeries.kendallTau(spark, sf).collect().head
    assert(row.getLong(0) === n0)
    assert(row.getLong(1) === s, "concordant-discordant balance")
    assert(row.getLong(2) === n1, "x ties")
    assert(row.getLong(3) === n2, "y ties")
    val tau = s.toDouble / math.sqrt((n0 - n1).toDouble * (n0 - n2).toDouble)
    assert(math.abs(row.getDouble(4) - tau) < 1e-12 * math.max(1.0, math.abs(tau)))
    assert(tau >= -1.0 && tau <= 1.0)
  }

  test("pacf: Durbin-Levinson recursion replayed over q210's own ACF values") {
    val sf = "/root/testdata/sf0.001"
    val acf = TimeSeries.revenueAcf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    val (r1, r2, r3) = (acf(1L), acf(2L), acf(3L))
    val p2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val phi21 = r1 - p2 * r1
    val p3 = (r3 - phi21 * r2 - p2 * r1) / (1.0 - phi21 * r1 - p2 * r2)
    val rows = TimeSeries.pacf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.length === 3)
    assert(rows(0) === ((1L, r1, r1)), "lag 1: pacf = acf")
    assert(rows(1)._2 === r2)
    assert(math.abs(rows(1)._3 - p2) < 1e-15, "lag-2 partial")
    assert(rows(2)._2 === r3)
    assert(math.abs(rows(2)._3 - p3) < 1e-15, "lag-3 partial")
  }

  test("seasonal mann-kendall: per-dow S and variance recomputed; totals fold") {
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val daily = graft.core.Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate")).as("day"),
        (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("x"))
      .withColumn("dn", datediff(col("day"), lit("1990-01-01").cast("date")).cast("long"))
      .collect().map(r => (r.getLong(2), r.getLong(1)))
    val byDow = daily.groupBy(_._1 % 7)
    val expected = byDow.map { case (dow, ds) =>
      val xs = ds.sortBy(_._1).map(_._2)
      var s = 0L
      for (i <- xs.indices; j <- (i + 1) until xs.length)
        s += java.lang.Long.signum(xs(j) - xs(i)).toLong
      val n = xs.length.toLong
      val tie = xs.groupBy(identity).values.map(_.length.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      (dow, (n, s, n * (n - 1) * (2 * n + 5) - tie))
    }
    val rows = TimeSeries.seasonalMannKendall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows.length === expected.size, "one row per day-of-week")
    rows.foreach { case (dow, nDow, sDow, varDow, _, _, _) =>
      val (n, s, v) = expected(dow)
      assert(nDow === n, s"dow $dow n")
      assert(sDow === s, s"dow $dow S")
      assert(varDow === v, s"dow $dow variance numerator")
    }
    val sTot = expected.values.map(_._2).sum
    val vTot = expected.values.map(_._3).sum
    assert(rows.head._5 === sTot, "summed S")
    assert(rows.head._6 === vTot, "summed variance numerator")
    val varS = vTot.toDouble / 18.0
    val z = if (sTot > 0) (sTot - 1).toDouble / math.sqrt(varS)
      else if (sTot < 0) (sTot + 1).toDouble / math.sqrt(varS) else 0.0
    assert(rows.head._7 === z, "combined z")
    assert(rows.forall(r => r._5 == sTot && r._6 == vTot && r._7 == z),
      "totals repeated on every row")
  }

  test("forecast compare: AR arm recomputed from phi and the mean; months partition") {
    import java.math.{BigDecimal => BD, RoundingMode}
    def q12(x: Double): BD =
      new BD(java.lang.Double.toString(x)).setScale(12, RoundingMode.HALF_UP)
    val rows = TimeSeries.forecastCompare(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length === rows.length, "months unique")
    val xs = series()
    // both arms drop the first day (no lag), so the joined error frame
    // partitions the remaining |days| − 1 across the months
    assert(rows.map(_._2).sum === xs.length - 1L, "n_days partition")
    // AR(1) arm: x̂ₜ = m + φ(xₜ₋₁ − m), φ = the gated lag-1 ACF, m the mean
    val phi = TimeSeries.revenueAcf(spark, sf).collect()
      .find(_.getLong(0) == 1L).get.getDouble(2)
    val m = xs.sum.toDouble / xs.length.toDouble
    val days = graft.core.Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate")).as("day")).distinct().collect()
      .map(_.getDate(0).toLocalDate).sortBy(_.toEpochDay)
    val aeAr = days.zip(xs).drop(1).zip(xs.dropRight(1)).map {
      case ((d, x), xp) =>
        (d.toString.substring(0, 7), math.abs(x.toDouble - (m + phi * (xp.toDouble - m))))
    }
    val monthly = aeAr.groupBy(_._1).map { case (mo, es) =>
      val folded = es.map(e => q12(e._2)).reduce(_ add _)
      (mo, folded.toPlainString.toDouble / es.length.toDouble)
    }
    rows.foreach { case (mo, nDays, maeEw, maeAr, wins) =>
      val expected = monthly(mo.substring(0, 7))
      assert(math.abs(maeAr - expected) < 1e-9 * math.max(1.0, expected),
        s"$mo: AR MAE near the driver recompute ($maeAr vs $expected)")
      assert(maeEw >= 0.0 && maeAr >= 0.0)
      // the winner flag compares the exact decimal sums; with a shared
      // n_days divisor that ordering must agree with the divided MAEs
      // whenever they are not a rounding hair apart
      if (math.abs(maeAr - maeEw) > 1e-9)
        assert(wins === (maeAr < maeEw), s"$mo: winner flag")
    }
  }

  test("spearman: doubled-rank moments recomputed exactly; rho bounded") {
    val row = TimeSeries.spearman(spark, sf).collect().head
    val daily = graft.core.Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
      .collect().groupBy(_.getDate(0).toLocalDate)
      .map { case (_, rs) =>
        (rs.map(r => (BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact).sum,
          rs.length.toLong) }
      .toArray
    def doubled(vs: Array[Long]): Map[Long, Long] = {
      var below = 0L
      vs.groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
        .map { case (v, t) => val r = 2 * below + t + 1; below += t; (v, r) }
        .toMap
    }
    val (ux, uc) = (doubled(daily.map(_._1)), doubled(daily.map(_._2)))
    val us = daily.map(d => ux(d._1)); val ws = daily.map(d => uc(d._2))
    val n = daily.length.toLong
    val (su, sv) = (us.sum, ws.sum)
    // doubled average ranks always sum to n(n+1) — tie-invariant
    assert(su === n * (n + 1) && sv === n * (n + 1))
    val suu = us.map(u => u * u).sum
    val svv = ws.map(w => w * w).sum
    val suv = us.zip(ws).map { case (u, w) => u * w }.sum
    val rho = (n * suv - su * sv).toDouble /
      (math.sqrt((n * suu - su * su).toDouble) *
        math.sqrt((n * svv - sv * sv).toDouble))
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === suv, "cross moment exact")
    assert(row.getDouble(2) === rho, "rho is the one fixed tree")
    assert(rho >= -1.0 && rho <= 1.0)
  }

  test("theil u: both arms recomputed through the full bridged chains") {
    import java.math.{BigDecimal => BD, RoundingMode}
    def q12(x: Double): BD =
      new BD(java.lang.Double.toString(x)).setScale(12, RoundingMode.HALF_UP)
    def bridge(b: BD): Double = b.toPlainString.toDouble
    val row = TimeSeries.theilU(spark, sf).collect().head
    val xs = series()
    val n = xs.length
    assert(row.getLong(0) === n - 1L, "n_days drops only the first day")
    // EWMA arm: the q211 convolution replayed — term and weight quantized,
    // folded exactly, bridged, then normalized and lagged one day
    val ewmaNorm = (1 to n).map { k =>
      val js = 0 until math.min(40, k)
      val num = js.map(j => q12(xs(k - 1 - j).toDouble / (1L << (j + 1)).toDouble))
        .reduce(_ add _)
      val den = js.map(j => q12(1.0 / (1L << (j + 1)).toDouble)).reduce(_ add _)
      bridge(num) / bridge(den)
    }
    // AR arm: phi = gated lag-1 ACF, m the series mean
    val phi = TimeSeries.revenueAcf(spark, sf).collect()
      .find(_.getLong(0) == 1L).get.getDouble(2)
    val m = xs.sum.toDouble / n.toDouble
    def u2(fc: Int => Double): Double = {
      var sm = new BD(0); var sn = new BD(0)
      (1 until n).foreach { t =>
        val xPrev = xs(t - 1).toDouble
        val rm = (fc(t) - xs(t).toDouble) / xPrev
        val rn = (xPrev - xs(t).toDouble) / xPrev
        sm = sm.add(q12(rm * rm)); sn = sn.add(q12(rn * rn))
      }
      math.sqrt(bridge(sm) / bridge(sn))
    }
    val u2Ewma = u2(t => ewmaNorm(t - 1))
    val u2Ar = u2(t => m + phi * (xs(t - 1).toDouble - m))
    assert(math.abs(row.getDouble(1) - u2Ewma) < 1e-12 * math.max(1.0, u2Ewma),
      "EWMA arm U2")
    assert(math.abs(row.getDouble(2) - u2Ar) < 1e-12 * math.max(1.0, u2Ar),
      "AR arm U2")
    assert(row.getDouble(1) > 0.0 && row.getDouble(2) > 0.0)
  }

  test("seasonal index: means recomputed; day-weighted indices average to one") {
    val rows = TimeSeries.monthlySeasonalIndex(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSet === (1L to 12L).toSet, "all twelve months")
    val daily = graft.core.Tables.orders(spark, sf)
      .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice"))
      .collect().groupBy(_.getDate(0).toLocalDate)
      .toSeq.map { case (d, rs) => (d.getMonthValue.toLong,
        rs.map(r => (BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact).sum) }
    val overall = daily.map(_._2).sum.toDouble / daily.length.toDouble
    val byMonth = daily.groupBy(_._1)
    rows.foreach { case (m, nDays, mean, idx) =>
      val xs = byMonth(m).map(_._2)
      assert(nDays === xs.length.toLong, s"month $m day count")
      assert(mean === xs.sum.toDouble / xs.length.toDouble, s"month $m mean")
      assert(idx === mean / overall, s"month $m index")
      assert(idx > 0.0)
    }
    val weighted = rows.map(r => r._2.toDouble * r._4).sum / daily.length.toDouble
    assert(math.abs(weighted - 1.0) < 1e-9, "day-weighted mean index is 1")
  }

  test("ship-lag drift: monthly moments recomputed from exact day lags") {
    val odate = graft.core.Tables.orders(spark, sf)
      .selectExpr("o_orderkey", "CAST(o_orderdate AS DATE) AS d").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate)).toMap
    val lags = graft.core.Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey", "CAST(l_shipdate AS DATE) AS s").collect()
      .map { r =>
        val o = odate(r.getLong(0))
        (o.withDayOfMonth(1).toString, r.getDate(1).toLocalDate.toEpochDay - o.toEpochDay)
      }
    val rows = TimeSeries.shipLagDrift(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val byMonth = lags.groupBy(_._1)
    assert(rows.map(_._1).toSet === byMonth.keySet)
    rows.foreach { case (m, n, mean, sd) =>
      val ls = byMonth(m).map(_._2)
      assert(n === ls.length.toLong, s"$m line count")
      val (sl, sll) = (ls.sum, ls.map(l => BigInt(l) * l).sum)
      assert(mean === sl.toDouble / n.toDouble, s"$m mean lag")
      val sigma = math.sqrt((BigInt(n) * sll - BigInt(sl) * sl).toString.toDouble) / n.toDouble
      assert(sd === sigma, s"$m sd lag")
      // the synthetic ship dates are not anchored to order dates, so the
      // mean lag may be negative here — only σ has a sign guarantee
      assert(sd >= 0.0)
    }
  }

  test("runs test: runs, split and z recomputed from the raw day-ordered series") {
    val row = TimeSeries.runsTest(spark, sf).collect().head
    val xs = series()
    val sorted = xs.sorted
    val n = xs.length
    val m2 = sorted((n + 1) / 2 - 1) + sorted((n + 2) / 2 - 1)
    val signs = xs.flatMap { x =>
      if (x * 2 > m2) Some(1) else if (x * 2 < m2) Some(-1) else None
    }
    val nAbove = signs.count(_ == 1).toLong
    val nBelow = signs.count(_ == -1).toLong
    var runs = 0L
    signs.zipWithIndex.foreach { case (s, i) =>
      if (i == 0 || signs(i - 1) != s) runs += 1
    }
    assert(row.getLong(0) === nAbove)
    assert(row.getLong(1) === nBelow)
    assert(row.getLong(2) === runs, "run count")
    // the split around the median is as balanced as ties allow
    assert(math.abs(nAbove - nBelow) <= 1L)
    val (n1d, n2d, nd) = (nAbove.toDouble, nBelow.toDouble, (nAbove + nBelow).toDouble)
    val mu = 2.0 * n1d * n2d / nd + 1.0
    val sig2 = (2.0 * n1d * n2d * (2.0 * n1d * n2d - nd)) / (nd * nd * (nd - 1.0))
    assert(row.getDouble(3) === mu)
    assert(row.getDouble(4) === (runs.toDouble - mu) / math.sqrt(sig2), "z")
  }
}
