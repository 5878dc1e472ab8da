package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{Num, Tables}

/** Robust / inferential statistics over the fact table — the preprocessing
  * and hypothesis-testing primitives a data-quality pipeline runs before
  * trusting a batch. Everything FP-order-sensitive rides the engine's
  * standard determinism patterns: order statistics are integer-rank
  * selections (no interpolation — cross-engine interpolated percentiles
  * differ in expression shape, order statistics cannot), and sums of
  * continuous terms round each term to decimal and sum exactly.
  */
object Statistics {

  /** Winsorized pricing per return flag: clip extended price at the exact
    * p05/p95 ORDER STATISTICS (value at rank ceil(p·n) — rank ties don't
    * matter because the selected VALUE is tie-invariant), report clip
    * counts and the clipped exact sum. One ranked window per group over the
    * projected (flag, price) pairs, then one aggregate; the heavy table
    * never shuffles twice.
    */
  def winsorizedPricing(spark: SparkSession, sfDir: String,
      pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("price"))
    val byFlag = Window.partitionBy("flag")
    val ranked = li
      .withColumn("rn", row_number().over(byFlag.orderBy("price")))
      .withColumn("n", count(lit(1)).over(byFlag))
    val loRank = ceil(lit(pLo) * col("n"))
    val hiRank = ceil(lit(pHi) * col("n"))
    val cuts = ranked
      .filter(col("rn") === loRank || col("rn") === hiRank)
      .groupBy(col("flag"))
      .agg(
        min(when(col("rn") === loRank, col("price"))).as("p_lo"),
        min(when(col("rn") === hiRank, col("price"))).as("p_hi"))
    li.join(cuts, "flag")
      .groupBy(col("flag"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("price") < col("p_lo"), 1L).otherwise(0L)).as("n_clipped_low"),
        sum(when(col("price") > col("p_hi"), 1L).otherwise(0L)).as("n_clipped_high"),
        Num.sumMoney(least(greatest(col("price"), col("p_lo")), col("p_hi")))
          .as("winsorized_sum"),
        min(col("p_lo")).as("p_lo"), min(col("p_hi")).as("p_hi"))
  }

  /** Population stability index of the price distribution between the
    * pre-/post-1998-06 shipment cohorts — the standard drift alarm a
    * production pipeline runs between a reference batch and today's. Equi-
    * width buckets shared with [[Relational.priceHistogram]]; Laplace
    * smoothing (+1 per bucket) keeps every log argument finite without a
    * data-dependent epsilon; each (p_cur−p_ref)·ln(p_cur/p_ref) term rides
    * the engine's ln guard (12-decimal rounding of the log, see
    * [[TermStats.bm25Scores]]) and decimal-folds exactly. Cost: one
    * count aggregate over the table, then bucket-count arithmetic.
    */
  def priceDriftPsi(spark: SparkSession, sfDir: String): DataFrame = {
    val cut = lit("1998-06-01").cast("timestamp_ntz")
    val counts = Tables.lineitem(spark, sfDir)
      .select(
        floor(col("l_extendedprice") / 5000.0).cast("long").as("bucket"),
        when(col("l_shipdate") < cut, lit("ref")).otherwise(lit("cur")).as("cohort"))
      .groupBy(col("bucket"))
      .agg(
        sum(when(col("cohort") === "ref", 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("cohort") === "cur", 1L).otherwise(0L)).as("n_cur"))
    psiFromCounts(counts)
  }

  /** The PSI arithmetic over a per-bucket (bucket, n_ref, n_cur) counts
    * frame — shared by the batch alarm above and the streaming monitor
    * ([[graft.streaming.EventStream.psiMonitorAvailableNow]]), so both
    * tiers score drift with the identical, oracle-pinned formula.
    */
  private[graft] def psiFromCounts(counts: DataFrame): DataFrame = {
    val withTotals = counts
      .withColumn("t_ref", sum(col("n_ref")).over(Window.partitionBy()))
      .withColumn("t_cur", sum(col("n_cur")).over(Window.partitionBy()))
      .withColumn("n_buckets", count(lit(1)).over(Window.partitionBy()))
    val pRef = (col("n_ref") + lit(1L)).cast("double") / (col("t_ref") + col("n_buckets"))
    val pCur = (col("n_cur") + lit(1L)).cast("double") / (col("t_cur") + col("n_buckets"))
    val lnRatio = Num.decToDouble(log(pCur / pRef).cast(DecimalType(18, 12)))
    withTotals.agg(
      Num.decToDouble(sum(((pCur - pRef) * lnRatio).cast(DecimalType(28, 14))))
        .as("psi"),
      max(col("n_buckets")).as("n_buckets"),
      max(col("t_ref")).as("n_ref_rows"),
      max(col("t_cur")).as("n_cur_rows"))
  }

  /** Exact quantile table per group: the value at rank ceil(p·n) for each
    * requested p — [[winsorizedPricing]]'s order-statistic machinery
    * generalized to a long-format profile (the numeric summary a feature
    * store publishes per batch). One ranked window, then a tiny
    * probe-per-p cross join against the ranked frame; no interpolation by
    * design (see winsorize scaladoc).
    */
  def quantileTable(spark: SparkSession, sfDir: String,
      ps: Seq[Double] = Seq(0.1, 0.25, 0.5, 0.75, 0.9)): DataFrame = {
    val byFlag = Window.partitionBy("flag")
    val ranked = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("price"))
      .withColumn("rn", row_number().over(byFlag.orderBy("price")))
      .withColumn("n", count(lit(1)).over(byFlag))
    ranked
      .select(col("flag"), col("rn"), col("n"), col("price"),
        explode(array(ps.map(lit): _*)).as("p"))
      .filter(col("rn") === ceil(col("p") * col("n")))
      .select(col("flag"), col("p"), col("price").as("value"))
  }

  /** The 100 TB swap for [[quantileTable]], oracle-gated: the exact table
    * sorts every group (full per-group shuffle + sort), while
    * `approx_percentile` (Greenwald–Khanna summaries) aggregates map-side
    * in bounded memory and merges associatively — the only shape that holds
    * when a group no longer fits an executor. The sketch VALUES are
    * engine-specific (q71 stays rows-only for that reason), so what this
    * query gates is the CONTRACT: for each (group, p) the sketch's answer
    * must have rank within [⌊(p−ε)·n⌋, ⌈(p+ε)·n⌉] (ε = 1/accuracy —
    * `ApproximatePercentile`'s documented bound, verbatim; the tighter
    * |rank−⌈pn⌉| ≤ εn reading fails real data by one rank at the floor
    * boundary). The emitted rows carry the exact values
    * and the boolean verdict; the DuckDB oracle recomputes the exact values
    * and pins `within_bound = TRUE`, so a sketch drifting out of its bound
    * fails the hash gate — the swap's error budget is CI-enforced, not
    * just unit-tested.
    */
  def gkQuantileBound(spark: SparkSession, sfDir: String,
      ps: Seq[Double] = Seq(0.5, 0.95), accuracy: Int = 10000): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("price"))
    // one sketch row per (group, p); the frame is |groups| rows — broadcast it
    val sketch = li.groupBy(col("flag"))
      .agg(expr(s"approx_percentile(price, array(${ps.mkString(",")}), $accuracy)")
          .as("qs"),
        count(lit(1)).as("n"))
      .select(col("flag"), col("n"), posexplode(col("qs")).as(Seq("i", "approx")))
      .select(col("flag"), col("n"),
        element_at(array(ps.map(lit): _*), col("i").cast("int") + 1).as("p"),
        col("approx"))
    // the sketch value's rank interval in the exact data: one more fact scan,
    // no sort — counts of strictly-below and at-or-below per (group, p)
    val ranks = li.join(broadcast(sketch), Seq("flag"))
      .groupBy(col("flag"), col("p"), col("n"), col("approx"))
      .agg(
        sum(when(col("price") < col("approx"), 1L).otherwise(0L)).as("rank_lt"),
        sum(when(col("price") <= col("approx"), 1L).otherwise(0L)).as("rank_le"))
    // the documented contract: some rank r of the returned value satisfies
    // ⌊(p−ε)·n⌋ ≤ r ≤ ⌈(p+ε)·n⌉; the value's ranks span [rank_lt+1, rank_le]
    val eps = lit(1.0 / accuracy)
    val loBound = floor((col("p") - eps) * col("n"))
    val hiBound = ceil((col("p") + eps) * col("n"))
    val verdicts = ranks.select(col("flag"), col("p"),
      ((col("rank_lt") + lit(1) <= hiBound) &&
        (col("rank_le") >= loBound)).as("within_bound"))
    quantileTable(spark, sfDir, ps).join(verdicts, Seq("flag", "p"))
      .select(col("flag"), col("p"), col("value"), col("within_bound"))
  }

  /** Equi-depth feature binning: order totals cut into `nBins` buckets of
    * (near-)equal population, with per-bin census — the feature-engineering
    * step that turns a heavy-tailed numeric into a balanced categorical.
    * Semantics are boundary-based, NOT `ntile`: boundaries are the exact
    * order statistics at rank ⌈i·n/nBins⌉ (the q156 definition), and a row's
    * bin is 1 + #{boundaries strictly below its value} — ties at a boundary
    * fall to the lower bin, so the assignment is a pure function of the
    * VALUE (ntile's remainder-splitting assigns tied values to different
    * bins depending on sort-tie order, which no oracle can reproduce).
    * Scale shape: one sort confined to the bare value column finds the
    * nBins−1 boundaries; binning is then a broadcast of that array and a
    * per-row codegen'd count — one scan, no second shuffle wider than
    * nBins groups. At 100 TB, swap the exact boundaries for the GK sketch
    * exactly as q165 gates.
    */
  def equiDepthBins(spark: SparkSession, sfDir: String, nBins: Int = 10): DataFrame = {
    val prices = Tables.orders(spark, sfDir).select(col("o_totalprice").as("price"))
    val w = Window.orderBy(col("price"))
    val bounds = prices
      .withColumn("rn", row_number().over(w))
      // total count via a broadcast one-row aggregate, not a second
      // no-partition window (the q189 convention: the boundary pass owns
      // exactly ONE whitelisted bare-value sort)
      .crossJoin(broadcast(prices.agg(count(lit(1)).as("n"))))
      .select(col("price"), col("rn"), col("n"),
        explode(array((1 until nBins).map(lit): _*)).as("i"))
      .filter(col("rn") === ceil(col("i").cast("double") * col("n") / nBins))
      .agg(sort_array(collect_list(col("price"))).as("bs"))
    prices.crossJoin(broadcast(bounds))
      .select(col("price"),
        (lit(1) + size(filter(col("bs"), b => b < col("price")))).cast("long").as("bin"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("price")).as("min_price"),
        max(col("price")).as("max_price"),
        Num.sumMoney(col("price")).as("sum_price"))
  }

  /** Robust outlier census per event type: median / MAD (median absolute
    * deviation) flagging — the robust alternative to mean±kσ, immune to the
    * outliers it hunts (each pulls the mean and inflates σ, masking itself;
    * the median moves by at most one rank). Both medians are LOWER medians
    * (value at rank ⌈n/2⌉ — an observed value, no interpolation, exactly
    * the q156 convention), so every emitted number is an order statistic or
    * an exact integer count and the oracle reproduces them bit-for-bit.
    * Two ranked windows (value column only, text never moves) + one
    * broadcast of the |groups|-row median frames; the 100 TB swap for the
    * sorts is the q165-gated GK sketch, as everywhere in this family.
    */
  def madOutliers(spark: SparkSession, sfDir: String, cut: Double = 3.0): DataFrame = {
    val v = Tables.events(spark, sfDir)
      .select(col("event_type").as("g"), col("value").as("x"))
    def lowerMedian(df: DataFrame, valueCol: String, outCol: String): DataFrame = {
      val w = Window.partitionBy("g")
      df.withColumn("rn", row_number().over(w.orderBy(col(valueCol))))
        .withColumn("n", count(lit(1)).over(w))
        .filter(col("rn") === ceil(col("n") / 2.0))
        .select(col("g"), col(valueCol).as(outCol))
    }
    val med = lowerMedian(v, "x", "med")
    val dev = v.join(broadcast(med), Seq("g"))
      .select(col("g"), col("x"), abs(col("x") - col("med")).as("d"), col("med"))
    val mad = lowerMedian(dev, "d", "mad")
    dev.join(broadcast(mad), Seq("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("d") > lit(cut) * col("mad"), 1L).otherwise(0L)).as("n_outliers"),
        max(col("med")).as("med"),
        max(col("mad")).as("mad"))
  }

  /** Pearson chi-square test of independence for the returnflag ×
    * linestatus contingency table: expected counts from the margins, each
    * cell's (o−e)²/e rounded to decimal and summed exactly (a double sum
    * over cells would depend on aggregation order), plus the degrees of
    * freedom. The contingency table is |r·c| rows — window margins and the
    * final fold cost nothing after the one count aggregate.
    */
  def chiSquareFlagStatus(spark: SparkSession, sfDir: String): DataFrame = {
    val obs = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("o"))
    val withMargins = obs
      .withColumn("row_t", sum(col("o")).over(Window.partitionBy("l_returnflag")))
      .withColumn("col_t", sum(col("o")).over(Window.partitionBy("l_linestatus")))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
    val e = (col("row_t") * col("col_t")).cast("double") / col("n")
    val cell = (col("o").cast("double") - e) * (col("o").cast("double") - e) / e
    withMargins.agg(
      Num.decToDouble(sum(cell.cast(DecimalType(28, 12)))).as("chi2"),
      ((countDistinct(col("l_returnflag")) - 1) *
        (countDistinct(col("l_linestatus")) - 1)).as("dof"),
      max(col("n")).as("n_rows"))
  }

  /** TRAILING-WINDOW ANOMALY DETECTION over the daily order-revenue series —
    * each day z-scored against the mean/std of the 7 STRICTLY PRIOR days
    * (the self-calibrating metric alarm every ops dashboard runs; the
    * trailing frame excludes the current day so an anomaly can't suppress
    * its own alarm). Scale shape: the only corpus-sized job is the per-day
    * aggregate (map-side combined); every window then runs over the
    * |days|-row frame — a calendar, not the fact table — which is exactly
    * the PlanAudit-sanctioned aggregated-input global window.
    *
    * Cross-engine determinism: daily totals and their squares fold in exact
    * decimal (squares of DECIMAL(·,2) are exact DECIMAL(·,4)); mean,
    * variance (the Σx²−Σx·mean form, spelled in the SAME operation order in
    * both engines), sqrt and the z division are all correctly-rounded IEEE
    * ops. Days without a full prior window yield NULL stats; a zero-std
    * window yields NULL z and a false flag.
    */
  /** CUSUM CHANGE-POINT detection over the daily revenue series (Page 1954,
    * public) — the sequential alarm for a sustained upward level shift,
    * complementing [[dailyAnomalies]]' single-day spikes. The textbook
    * recursion S_i = max(0, S_{i-1} + (x_i − μ)) is not windowable as
    * written, but has the exact closed form
    *
    *   S_i = P_i − min(0, min_{j≤i} P_j),   P_i = Σ_{t≤i} (x_t − μ)
    *
    * — a running sum and a running min, BOTH plain window aggregates. To
    * keep every step exact (no decimal division for μ, whose rounding
    * differs between engines), the whole statistic is scaled by n: the
    * per-day deviation is n·x_i − T (T = total, both exact decimals), so
    * S'_i = n·S_i and the alarm S_i > 5%·T/20··· is the EXACT integer-domain
    * comparison S'_i·20 > n·T. Only the reported per-day excess divides
    * back to a double at the very end. Scale shape: one per-day aggregate
    * over the fact table; everything else runs on the |days|-row frame
    * (aggregated-input windows, PlanAudit-sanctioned) with the (n, T)
    * one-row frame broadcast.
    */
  def cusumShift(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      .select(to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("t"))
      .groupBy(col("day")).agg(sum(col("t")).as("tot"))
    val totals = daily.agg(count(lit(1)).as("n"), sum(col("tot")).as("tt"))
    val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
    val zero = lit(0).cast(DecimalType(38, 2))
    daily.crossJoin(broadcast(totals))
      .withColumn("dev", (col("n") * col("tot") - col("tt")).cast(DecimalType(38, 2)))
      .withColumn("prefix", sum(col("dev")).over(w))
      .withColumn("runmin", min(col("prefix")).over(w))
      // CASE, not least(): DuckDB's least() promotes DECIMAL args to DOUBLE,
      // silently leaving the exact domain — the one construct in this chain
      // whose type rules diverge between the engines
      .withColumn("s",
        col("prefix") - when(col("runmin") < 0, col("runmin")).otherwise(zero))
      .select(col("day"),
        Num.decToDouble(col("tot")).as("total"),
        (Num.decToDouble(col("s")) / col("n")).as("cusum_excess"),
        (col("s") * 20 > col("n") * col("tt")).as("alarm"))
  }

  def dailyAnomalies(spark: SparkSession, sfDir: String,
      windowDays: Int = 7, zThresh: Double = 2.0): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      .select(to_date(col("o_orderdate")).as("day"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("t"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_orders"), sum(col("t")).as("tot"))
    val w = Window.orderBy(col("day")).rowsBetween(-windowDays, -1)
    val cnt = count(lit(1)).over(w)
    val sx = Num.decToDouble(sum(col("tot")).over(w))
    val sxx = Num.decToDouble(sum(col("tot") * col("tot")).over(w))
    val x = Num.decToDouble(col("tot"))
    val mean = when(cnt === windowDays, sx / cnt)
    val sd = when(cnt === windowDays,
      sqrt(greatest((sxx - sx * mean) / (cnt - 1), lit(0.0))))
    daily
      .withColumn("x", x)
      .withColumn("mean_prior", mean)
      .withColumn("sd_prior", sd)
      .select(col("day"), col("n_orders"), col("x").as("total"),
        col("mean_prior"), col("sd_prior"),
        when(col("sd_prior") > 0,
          (col("x") - col("mean_prior")) / col("sd_prior")).as("z"),
        when(col("sd_prior") > 0,
          abs((col("x") - col("mean_prior")) / col("sd_prior")) > zThresh)
          .otherwise(lit(false)).as("is_anomaly"))
  }
}
