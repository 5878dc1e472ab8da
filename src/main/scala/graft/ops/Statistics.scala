package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** The GK rank-interval contract's two bounds, factored for every
    * sketch-gated operator (q237 equi-depth, q238 winsorize): ⌊n·a/b⌋ and
    * ⌈n·a/b⌉ as exact BIGINT expressions over a column named `nCol` and an
    * integer sub-expression `aExpr` (a column reference or a reduced
    * constant). Callers must keep a/b the REDUCED fraction so n·a stays
    * inside int64 at extreme n, and aExpr NON-NEGATIVE: Spark's DIV
    * truncates toward zero while DuckDB's `//` floors — they agree only on
    * non-negative numerators, which every (p−ε) numerator here is.
    */
  private[graft] def gkFloorRank(nCol: String, aExpr: String, b: Long): Column =
    expr(s"($nCol * ($aExpr)) DIV $b")
  private[graft] def gkCeilRank(nCol: String, aExpr: String, b: Long): Column =
    expr(s"($nCol * ($aExpr) + ${b - 1}) DIV $b")

  /** The 100 TB swap for [[winsorizedPricing]], oracle-gated like q237: clip
    * boundaries come from the GK sketch (`approx_percentile` per group —
    * bounded memory, mergeable, NO per-group sort), and the oracle pins the
    * rank-interval CONTRACT on the CLIP COUNTS rather than the
    * engine-specific boundary values. The sketch's p-boundary value v has
    * SOME rank in [L, H] = [⌊(p−ε)n⌋, ⌈(p+ε)n⌉]; v's occupied ranks span
    * m_v ≤ M consecutive positions (M = the group's max value multiplicity,
    * exact in both engines), so
    *   #\{price < v_lo\}  ∈ [max(L_lo − M, 0), H_lo − 1]
    *   #\{price > v_hi\}  ∈ [max(n − H_hi − (M−1), 0), n − L_hi]
    * — all-integer brackets (reduced fractions: p±ε at p=1/20, 19/20,
    * ε=1/10⁴) that DuckDB reproduces bit-for-bit and `within_bound = TRUE`
    * is hash-gated in CI. The exact q150 clip counts fall inside the same
    * brackets (its rank-⌈p·n⌉ boundary sits in [L, H] too) — spec-pinned.
    * Scale shape: one sketch aggregate + one broadcast join back + one
    * counting scan + a (flag, price)-group max — zero sorts.
    */
  def winsorizedPricingSketch(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("price"))
    val sketch = li.groupBy(col("flag")).agg(
      expr("approx_percentile(price, array(0.05, 0.95), 10000)").as("ps"),
      count(lit(1)).as("n_rows"))
      .select(col("flag"), col("ps")(0).as("v_lo"), col("ps")(1).as("v_hi"),
        col("n_rows"))
    val mults = li.groupBy(col("flag"), col("price")).agg(count(lit(1)).as("c"))
      .groupBy(col("flag")).agg(max(col("c")).as("m"))
    val counts = li.join(broadcast(sketch), "flag")
      .groupBy(col("flag"), col("n_rows"))
      .agg(
        sum(when(col("price") < col("v_lo"), 1L).otherwise(0L)).as("clip_lo"),
        sum(when(col("price") > col("v_hi"), 1L).otherwise(0L)).as("clip_hi"))
    val k = counts.join(broadcast(mults), "flag")
      .withColumn("lo_l", gkFloorRank("n_rows", "499", 10000))
      .withColumn("lo_h", gkCeilRank("n_rows", "501", 10000))
      .withColumn("hi_l", gkFloorRank("n_rows", "9499", 10000))
      .withColumn("hi_h", gkCeilRank("n_rows", "9501", 10000))
    k.select(col("flag"), col("n_rows"), col("m"),
      greatest(col("lo_l") - col("m"), lit(0L)).as("clip_lo_min"),
      (col("lo_h") - 1).as("clip_lo_max"),
      greatest(col("n_rows") - col("hi_h") - (col("m") - 1), lit(0L)).as("clip_hi_min"),
      (col("n_rows") - col("hi_l")).as("clip_hi_max"),
      (col("clip_lo") >= greatest(col("lo_l") - col("m"), lit(0L)) &&
        col("clip_lo") <= col("lo_h") - 1 &&
        col("clip_hi") >= greatest(col("n_rows") - col("hi_h") - (col("m") - 1), lit(0L)) &&
        col("clip_hi") <= col("n_rows") - col("hi_l"))
        .as("within_bound"))
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

  /** MONTHLY ORDER-PRIORITY MIX PSI against the corpus-wide mix — q155's
    * drift alarm TIME-SLICED: one PSI per month over the five priority
    * buckets (dense-filled, so a month missing a priority contributes its
    * absence rather than silently dropping the bucket), Laplace-smoothed
    * exactly as [[psiFromCounts]]; the monitor that turns "did the mix
    * drift" into "WHEN did it drift". Each (p_m − p_ref)·ln(p_m/p_ref)
    * term rides the 12-decimal ln bridge and decimal-folds per month.
    * Scale shape: one (month × priority) aggregate over orders; everything
    * after runs on |months|·5 rows.
    */
  def monthlyMixPsi(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.orders(spark, sfDir)
      .select(date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        col("o_orderpriority").as("pri"))
      .groupBy(col("month"), col("pri")).agg(count(lit(1)).as("n_mp"))
    val pris = cells.groupBy(col("pri")).agg(sum(col("n_mp")).as("n_p"))
    val nb = pris.agg(count(lit(1)).as("n_buckets"), sum(col("n_p")).as("n_total"))
    val dense = cells.select(col("month")).distinct()
      .crossJoin(broadcast(pris))
      .join(cells, Seq("month", "pri"), "left")
      .withColumn("n_mp", coalesce(col("n_mp"), lit(0L)))
    val mTot = dense.groupBy(col("month")).agg(sum(col("n_mp")).as("n_m"))
    val j = dense.join(broadcast(mTot), "month").crossJoin(broadcast(nb))
    val pCur = (col("n_mp") + lit(1L)).cast("double") /
      (col("n_m") + col("n_buckets"))
    val pRef = (col("n_p") + lit(1L)).cast("double") /
      (col("n_total") + col("n_buckets"))
    val lnRatio = Num.decToDouble(log(pCur / pRef).cast(DecimalType(18, 12)))
    j.groupBy(col("month"))
      .agg(max(col("n_m")).as("n_orders"),
        Num.decToDouble(sum(((pCur - pRef) * lnRatio).cast(DecimalType(28, 14))))
          .as("psi"))
  }

  /** HERFINDAHL–HIRSCHMAN CONCENTRATION INDEX of brand revenue per region —
    * HHI = Σ shareᵢ² over each region's part brands, THE antitrust/market-
    * structure number (10000·HHI > 2500 ⇒ concentrated): for a pipeline,
    * the skew early-warning that says one brand's keys will dominate a
    * region's partitions. Revenue folds as exact integer cents in
    * DECIMAL(38,0) (safe at any scale); each share is ONE division of
    * VARCHAR-bridged totals (the q205 decimal→double rule), each square
    * quantizes to 12 decimals before the per-region exact fold. Scale
    * shape: one fact-sized join chain (all dims broadcast), one
    * (region × brand) aggregate, then |regions|·|brands| rows.
    */
  def brandHhi(spark: SparkSession, sfDir: String): DataFrame = {
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(28, 12))
    val cells = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      .join(broadcast(Tables.part(spark, sfDir)
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))), "l_partkey")
      .join(broadcast(Tables.supplier(spark, sfDir)
        .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))), "l_suppkey")
      .join(broadcast(Tables.nation(spark, sfDir)
        .select(col("n_nationkey").as("s_nationkey"), col("n_regionkey"))),
        "s_nationkey")
      .join(broadcast(Tables.region(spark, sfDir)
        .select(col("r_regionkey").as("n_regionkey"), col("r_name"))),
        "n_regionkey")
      .groupBy(col("r_name").as("region"), col("p_brand").as("brand"))
      .agg(sum(col("cents").cast(DecimalType(38, 0)))
        .cast(DecimalType(38, 0)).as("rev"))
    val tot = cells.groupBy(col("region"))
      .agg(sum(col("rev")).cast(DecimalType(38, 0)).as("tot"))
    val share = Num.decToDouble(col("rev")) / Num.decToDouble(col("tot"))
    cells.join(broadcast(tot), "region")
      .groupBy(col("region"))
      .agg(count(lit(1)).as("n_brands"),
        Num.decToDouble(sum(q12(share * share))).as("hhi"))
  }

  /** ORDER-SIZE OVERDISPERSION — the Church–Gale variance-to-mean identity
    * (q281's trick) at ORDER grain: lines per order across ALL orders,
    * VMR = (N·S − T²)/(N·T) with T = Σk, S = Σk² exact BIGINTs (orders
    * with no lineitem rows contribute zero to both, so they never
    * materialize) — VMR ≈ 1 says order sizes are Poisson scatter and
    * mean-based planning holds; VMR ≫ 1 says bulk orders clump and the
    * orderkey join is skew-prone (the q97 alarm's distributional cousin).
    * One groupBy over lineitem, one fold, one double division.
    */
  def orderSizeVmr(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("k"))
    val n = Tables.orders(spark, sfDir).agg(count(lit(1)).as("n_orders"))
    per.agg(count(lit(1)).as("n_with_lines"),
        sum(col("k")).as("t"), sum(col("k") * col("k")).as("s2"))
      .crossJoin(broadcast(n))
      .select(col("n_orders"), col("n_with_lines"), col("t").as("n_lines"),
        (col("t").cast("double") / col("n_orders").cast("double"))
          .as("mean_lines"),
        ((col("n_orders") * col("s2") - col("t") * col("t")).cast("double") /
          (col("n_orders") * col("t")).cast("double")).as("vmr"))
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

  /** The 100 TB swap for [[equiDepthBins]] PROVEN END-TO-END, oracle-gated
    * the q165 way: boundaries come from the GK sketch
    * (`approx_percentile(price, array(i/nBins), accuracy)` — bounded-memory
    * map-side summaries, associative merge, NO sort anywhere), binning is
    * the identical broadcast-boundaries per-row count, and what the oracle
    * pins is the CONTRACT rather than the engine-specific boundary values.
    * Per q165's verbatim reading, boundary i's returned value has SOME rank
    * in [⌊(p±ε)n⌋ᵢ] (ε = 1/accuracy); binning counts values ≤ the boundary,
    * which under TIES can sit up to M−1 ranks past that (M = the column's
    * max value multiplicity — an exact aggregate both engines compute
    * identically), so bin i's population is bracketed by
    *   lo = L(i) − H(i−1) − (M−1),  hi = H(i) − L(i−1) + (M−1)
    * with L/H the floor/ceil rank bounds (boundary 0 ↦ rank 0, boundary
    * nBins ↦ rank n exactly). Every bound is INTEGER arithmetic only
    * (scaled by nBins·accuracy, floor/ceil as DIV) — no FP anywhere, so
    * DuckDB reproduces (bin, lo_bound, hi_bound) bit-for-bit and pins
    * `within_bound = TRUE`; a sketch drifting out of its documented bound
    * fails the hash gate in CI. Empty bins surface as pop 0 (generated
    * 1..nBins frame), failing the gate loudly instead of vanishing. This is
    * the first query that actually RUNS on sketch boundaries instead of
    * citing the swap; scale shape: one sketch aggregate + one broadcast
    * binning scan + a |values|-group count for M — zero sorts.
    */
  def equiDepthBinsSketch(spark: SparkSession, sfDir: String,
      nBins: Int = 10, accuracy: Int = 10000): DataFrame = {
    val prices = Tables.orders(spark, sfDir).select(col("o_totalprice").as("price"))
    val ps = (1 until nBins).map(i => i.toDouble / nBins)
    val sketch = prices.agg(
      expr(s"approx_percentile(price, array(${ps.mkString(",")}), $accuracy)").as("bs"),
      count(lit(1)).as("n"))
    val mRow = prices.groupBy(col("price")).agg(count(lit(1)).as("c"))
      .agg(max(col("c")).as("m"))
    val binned = prices.crossJoin(broadcast(sketch))
      .select(col("n"),
        (lit(1) + size(filter(col("bs"), b => b < col("price")))).cast("long").as("bin"))
      .groupBy(col("bin"), col("n"))
      .agg(count(lit(1)).as("n_rows"))
    val allBins = sketch.select(col("n"),
        explode(sequence(lit(1L), lit(nBins.toLong))).as("bin"))
      .crossJoin(broadcast(mRow))
    val nb = nBins.toLong
    val acc = accuracy.toLong
    val denom = nb * acc
    allBins.join(binned, Seq("bin", "n"), "left")
      .withColumn("n_rows", coalesce(col("n_rows"), lit(0L)))
      .withColumn("ub_l", when(col("bin") === nb, col("n"))
        .otherwise(gkFloorRank("n", s"bin * $acc - $nb", denom)))
      .withColumn("ub_h", when(col("bin") === nb, col("n"))
        .otherwise(gkCeilRank("n", s"bin * $acc + $nb", denom)))
      .withColumn("lb_l", when(col("bin") === 1, lit(0L))
        .otherwise(gkFloorRank("n", s"(bin - 1) * $acc - $nb", denom)))
      .withColumn("lb_h", when(col("bin") === 1, lit(0L))
        .otherwise(gkCeilRank("n", s"(bin - 1) * $acc + $nb", denom)))
      .select(col("bin"),
        (col("ub_l") - col("lb_h") - (col("m") - 1)).as("lo_bound"),
        (col("ub_h") - col("lb_l") + (col("m") - 1)).as("hi_bound"),
        (col("n_rows") >= col("ub_l") - col("lb_h") - (col("m") - 1) &&
         col("n_rows") <= col("ub_h") - col("lb_l") + (col("m") - 1))
          .as("within_bound"))
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
    anomaliesFromDaily(daily, windowDays, zThresh)
  }

  /** The q194 trailing-window z tail over a (day, n_orders, tot) daily
    * frame — shared VERBATIM by the batch alarm above and the streaming
    * twin ([[graft.streaming.OrderStream.dailyAnomalyAvailableNow]]), so
    * both tiers score anomalies with the identical, oracle-pinned trees.
    */
  private[graft] def anomaliesFromDaily(daily: DataFrame,
      windowDays: Int = 7, zThresh: Double = 2.0): DataFrame = {
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

  /** ROBUST (median/MAD) DAILY ANOMALIES — q194's trailing-window alarm with
    * the mean/σ replaced by median and median-absolute-deviation, the
    * heavy-tail-proof variant: one genuine spike inside the trailing window
    * inflates σ enough to mask the NEXT spike (masking), while the median and
    * MAD ignore up to half the window. The alarm is the EXACT integer
    * comparison |x − med| > k·MAD over cents (no FP anywhere in the
    * decision); the reported `dev_over_mad` ratio is one IEEE division of
    * exact longs. A zero-MAD window (≥ windowDays/2+1 identical prior days)
    * makes ANY deviation an alarm — the robust-z limit, documented rather
    * than special-cased. Days without a full prior window emit null
    * med/mad and is_anomaly = false, exactly like q194's warmup rows.
    *
    * Scale shape: one per-day aggregate over orders; the trailing median/MAD
    * run on the |days|-row aggregated frame (the sanctioned window class) via
    * a sorted ≤windowDays-element buffer per row — collect_list over the
    * daily frame, never over facts.
    */
  def robustDailyAnomalies(spark: SparkSession, sfDir: String,
      windowDays: Int = 7, k: Int = 5): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      .select(to_date(col("o_orderdate")).as("day"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("total_cents"))
    robustFromDaily(daily, windowDays, k)
  }

  /** The q318 median/MAD tail over a (day, total_cents) daily frame — shared
    * VERBATIM by the batch alarm above and the streaming twin
    * ([[graft.streaming.OrderStream.robustDailyAnomalyAvailableNow]]), the
    * [[anomaliesFromDaily]] convention at robust grain.
    */
  private[graft] def robustFromDaily(daily: DataFrame,
      windowDays: Int = 7, k: Int = 5): DataFrame = {
    require(windowDays % 2 == 1, "odd trailing window so the median is an element")
    val w = Window.orderBy(col("day")).rowsBetween(-windowDays, -1)
    val mid = (windowDays + 1) / 2
    daily
      .withColumn("buf", sort_array(collect_list(col("total_cents")).over(w)))
      .withColumn("med_prior",
        when(size(col("buf")) === windowDays, element_at(col("buf"), mid)))
      .withColumn("mad_prior",
        when(size(col("buf")) === windowDays,
          element_at(sort_array(transform(col("buf"),
            v => abs(v - col("med_prior")))), mid)))
      .select(col("day"), col("total_cents"), col("med_prior"), col("mad_prior"),
        when(col("mad_prior") > 0,
          (col("total_cents") - col("med_prior")).cast("double") / col("mad_prior"))
          .as("dev_over_mad"),
        coalesce(abs(col("total_cents") - col("med_prior")) >
          lit(k.toLong) * col("mad_prior"), lit(false)).as("is_anomaly"))
  }

  /** TWO-PHASE CUMULATIVE GROUP COUNTS per distinct value — the shared
    * engine under the KS and rank-sum tests. For a (value, group∈{1,2})
    * stream, returns one row per distinct value with the per-value counts
    * (c1, c2) and the cumulative counts of each group at-or-below that
    * value (cum1, cum2). The naive spelling is a no-partition running-sum
    * window over every distinct value — near-unique doubles make that the
    * whole table through one task. Here it is the q184 algebra applied to
    * CUMULATIVE SUMS instead of ranks: value-range buckets off a broadcast
    * (min, max) (a pure per-row function of the value — equal values always
    * share a bucket), per-bucket subtotals prefix-summed over the
    * |buckets|-row frame, and bucket-LOCAL running sums offset by the
    * bucket's prefix. Every window is either |buckets|-rows or partitioned.
    */
  private[graft] def cumulativeGroupCounts(byValue: DataFrame, nBuckets: Int = 64): DataFrame = {
    val range = byValue.agg(min(col("x")).as("__mn"), max(col("x")).as("__mx"))
    val span = col("__mx") - col("__mn")
    val fwd = floor((col("x") - col("__mn")) / (span / nBuckets)).cast("long")
    val bucketed = byValue.crossJoin(broadcast(range))
      .withColumn("__bucket",
        when(span === 0, lit(0L)).otherwise(least(fwd, lit(nBuckets - 1L))))
      .drop("__mn", "__mx")
    val prior = Window.orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("__bucket"))
      .agg(sum(col("c1")).as("__b1"), sum(col("c2")).as("__b2"))
      .select(col("__bucket"),
        coalesce(sum(col("__b1")).over(prior), lit(0L)).as("__o1"),
        coalesce(sum(col("__b2")).over(prior), lit(0L)).as("__o2"))
    val local = Window.partitionBy(col("__bucket")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, 0)
    bucketed.join(broadcast(offsets), Seq("__bucket"))
      .select(col("x"), col("c1"), col("c2"),
        (col("__o1") + sum(col("c1")).over(local)).as("cum1"),
        (col("__o2") + sum(col("c2")).over(local)).as("cum2"))
  }

  /** REVENUE CONCENTRATION TABLE (the Lorenz-curve deciles) — the "what
    * share do the top customers hold" readout beside q205's scalar Gini:
    * customers rank by lifetime revenue (two-phase rank — no single-task
    * sort even over 10⁸ customers), deal into `nTiles` rank tiles, and each
    * tile reports its population, exact cents, cumulative cents and
    * cumulative share. EVERYTHING integer until the one share division per
    * tile: tile = (rk−1)·nTiles DIV n (floor-distribution ntile — a pure
    * function of the rank, engine-independent, never ntile()'s
    * remainder-splitting), cumulative sums over the nTiles-row frame.
    * Scale shape: one per-customer aggregate, the q184 rank machinery,
    * one nTiles-group aggregate + an nTiles-row window.
    */
  def revenueConcentration(spark: SparkSession, sfDir: String,
      nTiles: Int = 10): DataFrame = {
    val cust = Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("cents"))
    val n = cust.agg(count(lit(1)).as("n"), sum(col("cents")).as("total"))
    val tiled = Relational.twoPhaseRank(cust, "cents", "o_custkey", "rk")
      .crossJoin(broadcast(n))
      .withColumn("tile", expr(s"((rk - 1) * $nTiles) DIV n") + 1)
    val byTile = tiled.groupBy(col("tile"), col("n"), col("total"))
      .agg(count(lit(1)).as("n_customers"), sum(col("cents")).as("tile_cents"))
    val cum = Window.orderBy(col("tile"))
      .rowsBetween(Window.unboundedPreceding, 0)
    byTile
      .withColumn("cum_cents", sum(col("tile_cents")).over(cum))
      .select(col("tile"), col("n_customers"), col("tile_cents"), col("cum_cents"),
        (col("cum_cents").cast("double") / col("total").cast("double"))
          .as("cum_share"),
        (col("tile_cents").cast("double") / col("total").cast("double"))
          .as("tile_share"))
  }

  /** CHI-SQUARE TEST OF INDEPENDENCE between document language and length
    * band (q239's segments) — the categorical companion to the KS (q203) and
    * rank-sum (q204) tests: does document length depend on language? A
    * corpus where it does needs per-language length normalization (q199)
    * before mixing. Observed counts are exact ints over the FULL lang×band
    * grid (zero cells generated, not dropped — a missing cell still
    * contributes its expectation); E = rt·ct/n multiplies as DOUBLES (rt·ct
    * overflows int64 at extreme n) — a fixed correctly-rounded tree, so the
    * per-cell (O−E)²/E doubles are cross-engine identical with NO
    * quantization; only the cell SUM folds through the 9-decimal grid
    * (cells ≤ ~10⁴ at gate scales — ulp-safe with 10³× margin, the §8.4
    * magnitude rule). dof = (|langs|−1)·(|bands|−1) exact.
    * Scale shape: one |langs|×3-cell aggregate off one scan; everything
    * after runs on ≤ dozens of rows.
    */
  def chiSquareLangLength(spark: SparkSession, sfDir: String): DataFrame = {
    // a NULL lang must be a VISIBLE category, not a silent exclusion: the
    // grid/marginal equi-joins drop null keys in both engines identically,
    // which would make Σcells < n without failing any gate (the q199
    // null-partition class) — coalesce to NUL makes it a countable row
    val docs = Tables.documents(spark, sfDir)
      .select(coalesce(col("lang"), lit("\u0000")).as("lang"),
        Evaluation.lengthBand.as("band"))
    val obs = docs.groupBy(col("lang"), col("band")).agg(count(lit(1)).as("o"))
    val langs = obs.select(col("lang")).distinct()
    val bands = obs.select(col("band")).distinct()
    val rowTot = obs.groupBy(col("lang")).agg(sum(col("o")).as("rt"))
    val colTot = obs.groupBy(col("band")).agg(sum(col("o")).as("ct"))
    val tot = obs.agg(sum(col("o")).as("n"),
      countDistinct(col("lang")).as("nl"), countDistinct(col("band")).as("nb"))
    val e = col("rt").cast("double") * col("ct").cast("double") / col("n").cast("double")
    val cells = langs.crossJoin(bands)
      .join(obs, Seq("lang", "band"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .join(broadcast(rowTot), "lang")
      .join(broadcast(colTot), "band")
      .crossJoin(broadcast(tot))
      .withColumn("expected", e)
      .withColumn("cell_chi2",
        (col("o").cast("double") - col("expected")) *
          (col("o").cast("double") - col("expected")) / col("expected"))
    val total = cells.agg(
      Num.decToDouble(sum(col("cell_chi2").cast("string")
        .cast(org.apache.spark.sql.types.DecimalType(28, 9)))).as("chi2"),
      max((col("nl") - 1) * (col("nb") - 1)).as("dof"))
    cells.select(col("lang"), col("band"), col("o"), col("rt"), col("ct"),
      col("expected"), col("cell_chi2"))
      .crossJoin(broadcast(total))
  }

  /** CRAMÉR'S V — the bounded [0,1] effect size of [[chiSquareLangLength]]:
    * V = √(χ²/(n·min(r−1, c−1))), the number a release gate can threshold
    * where raw χ² scales with n (at 10⁹ documents EVERYTHING is
    * "significant"; V says whether the dependence is material). One fixed
    * correctly-rounded tree over the already-deterministic χ² — sqrt is
    * IEEE-exact in both engines. φ² = χ²/n reported beside it.
    */
  def cramersV(spark: SparkSession, sfDir: String): DataFrame =
    chiSquareLangLength(spark, sfDir)
      .groupBy(col("chi2"), col("dof"))
      .agg(sum(col("o")).as("n"),
        countDistinct(col("lang")).as("nl"), countDistinct(col("band")).as("nb"))
      .select(col("chi2"), col("dof"), col("n"),
        (col("chi2") / col("n").cast("double")).as("phi2"),
        sqrt(col("chi2") / (col("n").cast("double") *
          least(col("nl") - 1, col("nb") - 1).cast("double"))).as("cramers_v"))

  /** [[cumulativeGroupCounts]] generalized to run WITHIN each `partCols`
    * group (the q239 shape: one cumulative-count stream per segment) — the
    * same offsetRank→offsetRankBy generalization the rank engine got in
    * round 12. Ranges come from a broadcast per-group (min, max), offsets
    * prefix-sum over the (|groups|·|buckets|)-row frame partitioned by the
    * group, running sums are (group, bucket)-local — a segment holding 80%
    * of the stream still spreads over its buckets. Kept SEPARATE from the
    * global form (not delegated) so the green q203/q204/q235 plans keep
    * their exact audited shape; the two bodies mirror line for line.
    */
  private[graft] def cumulativeGroupCountsBy(byValue: DataFrame,
      partCols: Seq[String], nBuckets: Int = 64): DataFrame = {
    require(partCols.nonEmpty, "use cumulativeGroupCounts for the global form")
    val range = byValue.groupBy(partCols.map(col): _*)
      .agg(min(col("x")).as("__mn"), max(col("x")).as("__mx"))
    val span = col("__mx") - col("__mn")
    val fwd = floor((col("x") - col("__mn")) / (span / nBuckets)).cast("long")
    val bucketed = byValue.join(broadcast(range), partCols)
      .withColumn("__bucket",
        when(span === 0, lit(0L)).otherwise(least(fwd, lit(nBuckets - 1L))))
      .drop("__mn", "__mx")
    val prior = Window.partitionBy(partCols.map(col): _*).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy((partCols :+ "__bucket").map(col): _*)
      .agg(sum(col("c1")).as("__b1"), sum(col("c2")).as("__b2"))
      .select(partCols.map(col) ++ Seq(col("__bucket"),
        coalesce(sum(col("__b1")).over(prior), lit(0L)).as("__o1"),
        coalesce(sum(col("__b2")).over(prior), lit(0L)).as("__o2")): _*)
    val local = Window.partitionBy((partCols :+ "__bucket").map(col): _*)
      .orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, 0)
    bucketed.join(broadcast(offsets), partCols :+ "__bucket")
      .select(partCols.map(col) ++ Seq(col("x"), col("c1"), col("c2"),
        (col("__o1") + sum(col("c1")).over(local)).as("cum1"),
        (col("__o2") + sum(col("c2")).over(local)).as("cum2")): _*)
  }

  /** Per-value counts for the two compared order-priority samples. */
  private def prioritySamples(spark: SparkSession, sfDir: String,
      grp1: String, grp2: String): DataFrame =
    Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority").isin(grp1, grp2))
      .select(col("o_totalprice").as("x"),
        when(col("o_orderpriority") === grp1, 1L).otherwise(0L).as("g"))
      .groupBy(col("x"))
      .agg(sum(col("g")).as("c1"), sum(lit(1L) - col("g")).as("c2"))

  /** TWO-SAMPLE KOLMOGOROV–SMIRNOV TEST: does the order-price distribution
    * differ between URGENT and LOW priority orders? D = max_v |F̂₁(v) −
    * F̂₂(v)| evaluated at every distinct value (the empirical CDFs only jump
    * there). EXACT INTEGER DOMAIN throughout: the maximized quantity is
    * |cum1·n2 − cum2·n1| (a BIGINT — no per-value division ever happens),
    * and only the final D and the Smirnov critical value
    * c(α)·√((n1+n2)/(n1·n2)) divide into doubles, each a fixed
    * correctly-rounded tree over integers < 2⁵³. Scale shape: one
    * per-value aggregate over the fact table, then [[cumulativeGroupCounts]]
    * (two-phase, no single-task window), then a plain max — the 100 TB KS.
    */
  def ksTest(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = prioritySamples(spark, sfDir, "1-URGENT", "5-LOW")
    val cum = cumulativeGroupCounts(counts)
    val tot = cum.agg(max(col("cum1")).as("n1"), max(col("cum2")).as("n2"))
    val d = cum.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        abs(col("cum1") * col("n2") - col("cum2") * col("n1")).as("dn"))
      .groupBy(col("n1"), col("n2")).agg(max(col("dn")).as("d_num"))
    val n1d = col("n1").cast("double")
    val n2d = col("n2").cast("double")
    val ks = col("d_num").cast("double") / (n1d * n2d)
    val crit = lit(1.3581) * sqrt((n1d + n2d) / (n1d * n2d))
    d.select(col("n1"), col("n2"), col("d_num"), ks.as("ks_stat"),
      crit.as("crit_05"), (ks > crit).as("reject_05"))
  }

  /** MANN–WHITNEY U (Wilcoxon rank-sum) TEST over the same two priority
    * samples — the rank-based location test that needs no normality
    * assumption. Computed WITHOUT per-row global ranks: from per-value
    * counts, 2·U₁ = Σ_v c1(v)·(2·cum2(v) − c2(v)) — cum2 at-or-below v
    * minus the tie row's own c2 leaves (strictly-below + ½·ties), doubled
    * to stay integer. Tie correction T = Σ(t³ − t) folds in the same
    * aggregate. The normal approximation z = (U₁ − n1n2/2)/σ with
    * σ = √(n1n2/12 · (N+1 − T/(N(N−1)))) is one fixed correctly-rounded
    * tree over exact integers (doubled-U halves exactly: /2 is an exponent
    * shift). Scale shape identical to [[ksTest]]: aggregate → two-phase
    * cumulative → one final fold.
    */
  def rankSum(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = prioritySamples(spark, sfDir, "1-URGENT", "5-LOW")
    val cum = cumulativeGroupCounts(counts)
    val t = col("c1") + col("c2")
    val s = cum.agg(
      max(col("cum1")).as("n1"), max(col("cum2")).as("n2"),
      sum(col("c1") * (lit(2L) * col("cum2") - col("c2"))).as("u2x"),
      sum(t * t * t - t).as("ties"))
    val n1d = col("n1").cast("double")
    val n2d = col("n2").cast("double")
    val nD = (col("n1") + col("n2")).cast("double")
    val u1 = col("u2x").cast("double") / lit(2.0)
    val mu = n1d * n2d / lit(2.0)
    val tieCorr = col("ties").cast("double") /
      (nD * (col("n1") + col("n2") - 1L).cast("double"))
    val sigma = sqrt(n1d * n2d / lit(12.0) *
      ((col("n1") + col("n2") + 1L).cast("double") - tieCorr))
    s.select(col("n1"), col("n2"), u1.as("u1"), mu.as("mu"),
      sigma.as("sigma"), ((u1 - mu) / sigma).as("z"))
  }

  /** 1-D WASSERSTEIN (earth-mover) DISTANCE between two sources' document-
    * length distributions — the drift metric that, unlike KS (q203) or PSI
    * (q155), weights HOW FAR mass moved, not just whether CDFs separate:
    * W₁ = ∫|F̂₁ − F̂₂| dx. EXACT INTEGER DOMAIN until one division: the CDFs
    * only change at observed values, so W₁·n₁·n₂ = Σ_v |cum1·n₂ − cum2·n₁|
    * ·(v₊ − v) over consecutive distinct lengths — per-segment products
    * fold in DECIMAL(38,0)/HUGEINT (safe at any corpus size), then ONE
    * bridged division by n₁·n₂. Scale shape: one per-value aggregate over
    * documents, the q203 two-phase cumulative engine, one lead window over
    * the |values|-row aggregated frame (the sanctioned class), one fold.
    */
  def wasserstein1d(spark: SparkSession, sfDir: String,
      srcA: String = "src0", srcB: String = "src1"): DataFrame = {
    val counts = Tables.documents(spark, sfDir)
      .filter(col("source").isin(srcA, srcB))
      .select(col("n_chars").cast("long").as("x"),
        when(col("source") === srcA, 1L).otherwise(0L).as("g"))
      .groupBy(col("x"))
      .agg(sum(col("g")).as("c1"), sum(lit(1L) - col("g")).as("c2"))
    val cum = cumulativeGroupCounts(counts)
    val tot = cum.agg(max(col("cum1")).as("n1"), max(col("cum2")).as("n2"))
    val w = Window.orderBy(col("x"))
    val segs = cum.withColumn("gap", lead(col("x"), 1).over(w) - col("x"))
      .filter(col("gap").isNotNull)
      .crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        (abs(col("cum1") * col("n2") - col("cum2") * col("n1"))
          .cast(DecimalType(38, 0)) * col("gap")).cast(DecimalType(38, 0))
          .as("seg"))
    segs.groupBy(col("n1"), col("n2"))
      .agg(sum(col("seg")).cast(DecimalType(38, 0)).as("num"))
      .select(col("n1"), col("n2"), Num.decToDouble(col("num")).as("moved_mass"),
        (Num.decToDouble(col("num")) /
          (col("n1").cast("double") * col("n2").cast("double"))).as("w1_chars"))
  }

  /** CLIFF'S DELTA (Cliff 1993, public) over the same two priority samples
    * as q203/q204 — the ORDINAL effect size those tests lack: δ =
    * (#{x₁ > x₂} − #{x₁ < x₂})/(n₁·n₂) in [−1, 1], the number that says
    * whether a significant rank-sum z is a real shift or a giant-n mirage.
    * ENTIRELY exact until one division: from the same per-value counts +
    * two-phase cumulative frame q204 rides, GT = Σ c1·(cum2 − c2) (group-2
    * values strictly below), TIE = Σ c1·c2, LT = n₁n₂ − GT − TIE — all
    * exact BIGINTs — and δ = (GT − LT)/(n₁·n₂) is ONE double division.
    * Scale shape identical to q203/q204: aggregate → two-phase cumulative
    * → one fold (the documented int64 boundary on n₁·n₂ applies as there).
    */
  def cliffsDelta(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = prioritySamples(spark, sfDir, "1-URGENT", "5-LOW")
    val cum = cumulativeGroupCounts(counts)
    val s = cum.agg(max(col("cum1")).as("n1"), max(col("cum2")).as("n2"),
      sum(col("c1") * (col("cum2") - col("c2"))).as("gt"),
      sum(col("c1") * col("c2")).as("ties"))
    s.select(col("n1"), col("n2"), col("gt"), col("ties"),
      (col("n1") * col("n2") - col("gt") - col("ties")).as("lt"),
      ((col("gt") - (col("n1") * col("n2") - col("gt") - col("ties")))
        .cast("double") / (col("n1") * col("n2")).cast("double")).as("delta"))
  }

  /** GINI COEFFICIENT of customer lifetime spend per market segment — the
    * inequality audit behind "do 20% of customers drive 80% of revenue?".
    * Rank formula G = (2·Σᵢ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) with i the
    * within-segment ascending rank (custkey tie-break — ties of equal x
    * permute only equal terms, so the statistic is tie-invariant). EXACT
    * until the last division: spend converts to integer CENTS so every
    * product and sum lives in DECIMAL(·,0) — Spark's and DuckDB's decimal
    * MULTIPLICATION width rules diverge near the 38-digit cap for scaled
    * decimals, integer-scaled ones never do — and numerator/denominator
    * cross the VARCHAR bridge before one final double divide. Scale shape:
    * the corpus-sized job is the per-customer aggregate; the rank window is
    * PARTITIONED by segment over one-row-per-customer aggregated input (the
    * documented per-group boundary-pass class — at extreme per-segment
    * cardinality, swap in the q184 two-phase rank per segment; same
    * algebra).
    */
  def giniBySegment(spark: SparkSession, sfDir: String): DataFrame = {
    val spend = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("segment"), col("c_custkey"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("spend"))
      .withColumn("cents", (col("spend") * 100).cast(DecimalType(20, 0)))
    val w = Window.partitionBy(col("segment"))
      .orderBy(col("cents"), col("c_custkey"))
    val ranked = spend.withColumn("i", row_number().over(w).cast("long"))
    val g = ranked.groupBy(col("segment")).agg(
      count(lit(1)).as("n_cust"),
      sum(col("cents")).as("sx"),
      sum((col("i") * col("cents")).cast(DecimalType(38, 0))).as("six"))
    val num = (lit(2L) * col("six") - (col("n_cust") + 1L) * col("sx"))
      .cast(DecimalType(38, 0))
    val den = (col("n_cust") * col("sx")).cast(DecimalType(38, 0))
    g.select(col("segment"), col("n_cust"),
      (Num.decToDouble(col("sx")) / lit(100.0)).as("total_spend"),
      (Num.decToDouble(num) / Num.decToDouble(den)).as("gini"))
  }

  /** POISSON-BOOTSTRAP CONFIDENCE INTERVAL for the mean daily revenue —
    * THE map-reduce-native resampling scheme (each element independently
    * draws a Poisson(1) weight per replica, so no replica ever needs a
    * global sample-with-replacement pass; Chamandy et al., Google 2012,
    * public). Weights are DETERMINISTIC: md5(day:replica) → a uniform in
    * [0,1) (8 hex nibbles / 2³²) → the inverse Poisson CDF with PINNED
    * 17-digit cumulative thresholds, identical literals in both engines.
    * Replica means are exact-integer Σwx/Σw with one division; the CI
    * bounds are rank-selected order statistics over the |replicas|-row
    * frame. Scale shape: the fact table reduces per day ONCE; the
    * |days|×B fan-out and everything after is calendar-sized. (At the
    * 100 TB design point the same weights attach per ROW in the first
    * aggregate — one pass, B columns or B-key explode — unchanged
    * algebra.)
    */
  def bootstrapCi(spark: SparkSession, sfDir: String, nReps: Int = 200): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      .select(to_date(col("o_orderdate")).as("day"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("x"))
      .groupBy(col("day")).agg(sum(col("x")).as("x"))
    val reps = spark.range(0, nReps.toLong).select(col("id").as("b"))
    val unif = conv(substring(md5(concat(col("day").cast("string"), lit(":"), col("b"))),
      1, 8), 16, 10).cast("long").cast("double") / lit(4294967296.0)
    def t(s: String): Column = lit(s).cast("double")
    val w = when(unif < t("0.36787944117144233"), 0L)
      .when(unif < t("0.7357588823428847"), 1L)
      .when(unif < t("0.9196986029286058"), 2L)
      .when(unif < t("0.9810118431238463"), 3L)
      .when(unif < t("0.9963401531726563"), 4L)
      .when(unif < t("0.9994058151824183"), 5L)
      .otherwise(6L)
    val means = daily.crossJoin(broadcast(reps))
      .select(col("b"), col("x"), w.as("w"))
      .groupBy(col("b"))
      .agg(sum(col("w") * col("x")).as("swx"), sum(col("w")).as("sw"))
      .select(col("b"), (col("swx").cast("double") / col("sw").cast("double")).as("mean_b"))
    val ranked = means.withColumn("rn",
      row_number().over(Window.orderBy(col("mean_b"), col("b"))).cast("long"))
    val loRank = math.ceil(0.025 * nReps).toLong
    val hiRank = math.ceil(0.975 * nReps).toLong
    val bounds = ranked.agg(
      min(when(col("rn") === loRank, col("mean_b"))).as("ci_lo_cents"),
      min(when(col("rn") === hiRank, col("mean_b"))).as("ci_hi_cents"))
    daily.agg(count(lit(1)).as("n_days"),
        (sum(col("x")).cast("double") / count(lit(1))).as("mean_obs_cents"))
      .crossJoin(broadcast(bounds))
      .select(col("n_days"), lit(nReps.toLong).as("n_reps"),
        col("mean_obs_cents"), col("ci_lo_cents"), col("ci_hi_cents"))
  }

  /** BENFORD'S-LAW AUDIT of order totals: first-significant-digit counts vs
    * the log₁₀(1 + 1/d) expectation, with the χ² goodness-of-fit statistic.
    * The digit is extracted from the money value's DECIMAL STRING form
    * (both engines print a plain non-scientific decimal for DECIMAL(18,2),
    * and every total ≥ 1 so the first character IS the first significant
    * digit — no log10 whose libm rounding could differ at exact powers of
    * ten). Expected probabilities are pinned 12-decimal literals (identical
    * text in both engines → identical doubles). Each digit's χ² term is a
    * fixed correctly-rounded tree; the 9 terms quantize to DECIMAL(28,12)
    * and fold EXACTLY into the total (a 9-row aggregated-input window —
    * sum order across engines never matters). Scale: one groupBy(digit)
    * over the fact table; everything after runs on 9 rows.
    */
  /** Per-(value, priority) counts of order-total CENTS — the shared input
    * of the k-sample tests [[kruskalWallis]] / [[anovaF]] /
    * [[brownForsythe]]. One corpus-sized aggregate; everything downstream
    * runs on the |distinct values × 5| frame.
    */
  private def centsByPriority(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("x"), col("o_orderpriority").as("grp"))
      .groupBy(col("x"), col("grp")).agg(count(lit(1)).as("c"))

  /** KRUSKAL–WALLIS H TEST (Kruskal & Wallis 1952, public) — "do the five
    * order priorities draw total price from the same distribution?", the
    * k-sample generalization of q204's rank-sum test, computed WITHOUT
    * per-row global ranks: per-value midranks come from the [[ksTest]]
    * two-phase cumulative engine over the per-value total counts (c1 = t,
    * c2 = 0 — the engine's degenerate single-sample form), and the group
    * rank sums fold as the exact BIGINT 2·R_g = Σ_v c_g(v)·(2·below(v) +
    * t_v + 1) (doubled midranks stay integer under ties). The cross-group
    * fold Σ R_g²/n_g squares per group in DOUBLE (2·R_g ≈ 2·n_g·N can pass
    * 2⁶³ squared) — a fixed per-group tree — then sums the k=5 terms
    * 12-decimal-quantized (the q233 recipe: double sums across groups are
    * order-dependent, quantized decimal folds are not). Tie correction
    * C = 1 − Σ(t³−t)/(N³−N) folds exact (N³ ≈ 3·10¹⁵ < 2⁶³).
    * Scale shape: ONE corpus aggregate → |values| frame → two-phase
    * cumulative → 5-row fold; no single-task sort anywhere.
    */
  def kruskalWallis(spark: SparkSession, sfDir: String): DataFrame = {
    val byValGrp = centsByPriority(spark, sfDir)
    val byVal = byValGrp.groupBy(col("x")).agg(sum(col("c")).as("t"))
    val cum = cumulativeGroupCounts(
        byVal.select(col("x"), col("t").as("c1"), lit(0L).as("c2")))
      .select(col("x"), col("c1").as("t"), (col("cum1") - col("c1")).as("below"))
    val perGroup = byValGrp.join(cum, "x")
      .groupBy(col("grp"))
      .agg(sum(col("c")).as("n_g"),
        sum(col("c") * (lit(2L) * col("below") + col("t") + 1L)).as("r2x"))
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(38, 12))
    val r2d = col("r2x").cast("double")
    val term = r2d * r2d / (lit(4.0) * col("n_g").cast("double"))
    val folded = perGroup.agg(count(lit(1)).as("k"),
      sum(col("n_g")).as("n"), sum(q12(term)).as("term_sum_d"))
    val ties = byVal.agg(
      coalesce(sum(col("t") * col("t") * col("t") - col("t")), lit(0L))
        .as("tie3"))
    val nD = col("n").cast("double")
    val h = lit(12.0) / (nD * (nD + 1.0)) *
      Num.decToDouble(col("term_sum_d")) - lit(3.0) * (nD + 1.0)
    val corr = lit(1.0) - col("tie3").cast("double") /
      (col("n") * col("n") * col("n") - col("n")).cast("double")
    folded.crossJoin(broadcast(ties))
      .select(col("k"), col("n"), col("tie3"), h.as("h"),
        (h / corr).as("h_adj"), (col("k") - 1L).as("df"))
  }

  /** ONE-WAY ANOVA F + eta² across order priorities on total-price CENTS —
    * the parametric companion of [[kruskalWallis]]: per-group exact moment
    * folds (n_g, Σx as BIGINT, Σx² as DECIMAL — cents² sums pass 2⁶³),
    * then SSW = Σ_g (Σx²_g − (Σx_g)²/n_g) with each group's term a fixed
    * double tree quantized to 12 decimals before the exact cross-group
    * fold, SST from the same machinery at k=1, SSB = SST − SSW,
    * F = (SSB/(k−1))/(SSW/(N−k)), eta² = SSB/SST. Scale shape: one
    * map-side-combined aggregate over the fact table; the solve runs on
    * 5 rows.
    */
  def anovaF(spark: SparkSession, sfDir: String): DataFrame = {
    val xDec = col("x").cast(DecimalType(18, 0))
    val perGroup = centsByPriority(spark, sfDir)
      .groupBy(col("grp"))
      .agg(sum(col("c")).as("n_g"), sum(col("c") * col("x")).as("s_g"),
        sum(col("c").cast(DecimalType(18, 0)) * xDec * xDec).as("ss_g"))
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(38, 12))
    val sswTerm = Num.decToDouble(col("ss_g")) -
      col("s_g").cast("double") * col("s_g").cast("double") /
        col("n_g").cast("double")
    val folded = perGroup.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
      sum(col("s_g")).as("s"), sum(col("ss_g")).as("ss"),
      sum(q12(sswTerm)).as("ssw_d"))
    val sst = Num.decToDouble(col("ss")) -
      col("s").cast("double") * col("s").cast("double") / col("n").cast("double")
    val ssw = Num.decToDouble(col("ssw_d"))
    val ssb = sst - ssw
    val f = (ssb / (col("k") - 1L).cast("double")) /
      (ssw / (col("n") - col("k")).cast("double"))
    folded.select(col("k"), col("n"), ssb.as("ssb"), ssw.as("ssw"),
      f.as("f_stat"), (ssb / sst).as("eta_sq"))
  }

  /** BROWN–FORSYTHE TEST (Brown & Forsythe 1974, public) — variance
    * homogeneity across the five priorities: the [[anovaF]] machinery run
    * on |x − median_g| instead of x (the median-based Levene variant —
    * robust where the mean-based original mistakes skew for spread). The
    * group LOWER medians (value at rank ⌈n_g/2⌉ — an observed value, the
    * q156/q172 convention) come from the GROUPED two-phase cumulative
    * engine ([[cumulativeGroupCountsBy]], c1 = count, c2 = 0): smallest x
    * with cum ≥ ⌈n_g/2⌉ per group — no per-group sort. Deviations are
    * exact longs computed on the per-(value,group) COUNTED frame, so the
    * corpus is touched exactly once (the [[centsByPriority]] aggregate);
    * W's moment folds and the 12-decimal cross-group recipe are verbatim
    * [[anovaF]].
    */
  def brownForsythe(spark: SparkSession, sfDir: String): DataFrame = {
    val byValGrp = centsByPriority(spark, sfDir)
    val cum = cumulativeGroupCountsBy(
      byValGrp.select(col("grp"), col("x"), col("c").as("c1"), lit(0L).as("c2")),
      Seq("grp"))
    val nPer = byValGrp.groupBy(col("grp")).agg(sum(col("c")).as("n_g"))
    val medians = cum.join(broadcast(nPer), "grp")
      // DIV, not `/`: Column./ on longs is DOUBLE division (a .5 threshold
      // shifts even-sized groups' medians one rank up vs DuckDB's `//`)
      .filter(col("cum1") >= expr("(n_g + 1) DIV 2"))
      .groupBy(col("grp")).agg(min(col("x")).as("med"))
    val dev = byValGrp.join(broadcast(medians), "grp")
      .select(col("grp"), col("c"), abs(col("x") - col("med")).as("d"))
    val dDec = col("d").cast(DecimalType(18, 0))
    val perGroup = dev.groupBy(col("grp"))
      .agg(sum(col("c")).as("n_g"), sum(col("c") * col("d")).as("s_g"),
        sum(col("c").cast(DecimalType(18, 0)) * dDec * dDec).as("ss_g"))
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(38, 12))
    val sswTerm = Num.decToDouble(col("ss_g")) -
      col("s_g").cast("double") * col("s_g").cast("double") /
        col("n_g").cast("double")
    val folded = perGroup.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
      sum(col("s_g")).as("s"), sum(col("ss_g")).as("ss"),
      sum(q12(sswTerm)).as("ssw_d"))
    val sst = Num.decToDouble(col("ss")) -
      col("s").cast("double") * col("s").cast("double") / col("n").cast("double")
    val ssw = Num.decToDouble(col("ssw_d"))
    val ssb = sst - ssw
    val w = (ssb / (col("k") - 1L).cast("double")) /
      (ssw / (col("n") - col("k")).cast("double"))
    folded.select(col("k"), col("n"), ssb.as("ssb_dev"), ssw.as("ssw_dev"),
      w.as("w_stat"))
  }

  /** TWO-FEATURE OLS via normal equations — revenue regressed on quantity
    * AND discount in ONE distributed pass (the multiple-regression upgrade
    * of q143's single-feature recipe): nine exact-decimal moment folds
    * (n, Σx₁, Σx₂, Σy, Σx₁², Σx₂², Σx₁x₂, Σx₁y, Σx₂y, Σy²), then the 3×3
    * normal system solved by Cramer's rule as ONE fixed double tree —
    * cofactor expansion spelled in the identical operation order in both
    * engines, so every intermediate is a correctly-rounded IEEE op over
    * string-bridged moments. This is THE map-reduce regression shape: at
    * 100 TB the only corpus-sized job is the moment aggregate (map-side
    * combined); the solve runs on one row. R² from the same moments
    * (SST = Σy²−(Σy)²/n, SSE = Σy² − βᵀXᵀy).
    *
    * Exactness: quantity/price at DECIMAL(14,4), discount at DECIMAL(6,4)
    * — every product is an exact decimal (≤ (29,8)), every fold
    * order-independent; doubles appear only after [[Num.decToDouble]].
    */
  /** The nine exact-decimal OLS moment folds over lineitem — shared by
    * [[olsTwoFeature]] and [[olsInfluence]] (one corpus pass each; the
    * 1-row result broadcasts).
    */
  private def olsMoments(spark: SparkSession, sfDir: String): DataFrame = {
    val d = DecimalType(14, 4)
    val x1 = col("l_quantity").cast(d)
    val x2 = col("l_discount").cast(DecimalType(6, 4))
    val y = col("l_extendedprice").cast(d)
    Tables.lineitem(spark, sfDir).agg(
      count(lit(1)).as("n_rows"),
      sum(x1).as("s1_d"), sum(x2).as("s2_d"), sum(y).as("sy_d"),
      sum(x1 * x1).as("s11_d"), sum(x2 * x2).as("s22_d"),
      sum(x1 * x2).as("s12_d"),
      sum(x1 * y).as("s1y_d"), sum(x2 * y).as("s2y_d"),
      sum(y * y).as("syy_d"))
  }

  def olsTwoFeature(spark: SparkSession, sfDir: String): DataFrame = {
    val m = olsMoments(spark, sfDir)
    def dbl(name: String) = Num.decToDouble(col(name))
    val n = col("n_rows").cast("double")
    val s1 = dbl("s1_d"); val s2 = dbl("s2_d"); val sy = dbl("sy_d")
    val s11 = dbl("s11_d"); val s22 = dbl("s22_d"); val s12 = dbl("s12_d")
    val s1y = dbl("s1y_d"); val s2y = dbl("s2y_d"); val syy = dbl("syy_d")
    // Cramer's rule, cofactor expansion along the first row — the oracle
    // spells the SAME tree term for term
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    val b0 = det0 / det
    val b1 = det1 / det
    val b2 = det2 / det
    val sst = syy - sy * sy / n
    val sse = syy - (b0 * sy + b1 * s1y + b2 * s2y)
    m.select(col("n_rows"),
      b0.as("beta0"), b1.as("beta_qty"), b2.as("beta_disc"),
      (lit(1.0) - sse / sst).as("r2"))
  }

  /** OLS INFLUENCE DIAGNOSTICS — the top-`k` most influential rows of the
    * q257 regression by COOK'S DISTANCE (Cook 1977, public), entirely from
    * the broadcast moments: with A the adjugate of the 3×3 normal matrix,
    * per-row leverage hᵢ = xᵢᵀA xᵢ/det needs NO per-row matrix algebra —
    * one fixed quadratic-form tree over six broadcast scalars — and
    * Dᵢ = eᵢ²/(p·s²) · hᵢ/(1−hᵢ)². This is the 100 TB regression-audit
    * shape: ONE moment pass (shared with q257), one broadcast, one
    * scan-speed per-row map, and a distributed top-k (TakeOrdered — per-
    * partition heaps, no global sort). Determinism: every per-row input is
    * a raw parquet double or a string-bridged moment, every tree fixed and
    * spelled identically in the oracle; ties at the boundary break on
    * (orderkey, linenumber).
    */
  def olsInfluence(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    val m = olsMoments(spark, sfDir)
    def dbl(name: String) = Num.decToDouble(col(name))
    val n = col("n_rows").cast("double")
    val s1 = dbl("s1_d"); val s2 = dbl("s2_d"); val sy = dbl("sy_d")
    val s11 = dbl("s11_d"); val s22 = dbl("s22_d"); val s12 = dbl("s12_d")
    val s1y = dbl("s1y_d"); val s2y = dbl("s2y_d"); val syy = dbl("syy_d")
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    val stats = m.select(col("n_rows"),
      (det0 / det).as("b0"), (det1 / det).as("b1"), (det2 / det).as("b2"),
      (syy - ((det0 / det) * sy + (det1 / det) * s1y + (det2 / det) * s2y))
        .as("sse"),
      // adjugate of the symmetric normal matrix [[n,s1,s2],[s1,s11,s12],
      // [s2,s12,s22]] — six entries, spelled term for term in the oracle
      (s11 * s22 - s12 * s12).as("a00"),
      (-(s1 * s22 - s12 * s2)).as("a01"),
      (s1 * s12 - s11 * s2).as("a02"),
      (n * s22 - s2 * s2).as("a11"),
      (-(n * s12 - s1 * s2)).as("a12"),
      (n * s11 - s1 * s1).as("a22"),
      det.as("det"))
    val q = col("l_quantity"); val dd = col("l_discount")
    val h = (col("a00") + col("a11") * q * q + col("a22") * dd * dd +
      lit(2.0) * col("a01") * q + lit(2.0) * col("a02") * dd +
      lit(2.0) * col("a12") * q * dd) / col("det")
    val e = col("l_extendedprice") -
      (col("b0") + col("b1") * q + col("b2") * dd)
    val s2hat = col("sse") / (col("n_rows").cast("double") - 3.0)
    val cook = e * e / (lit(3.0) * s2hat) * (h / ((lit(1.0) - h) * (lit(1.0) - h)))
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"), col("l_extendedprice"))
      .crossJoin(broadcast(stats))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"), col("l_extendedprice"),
        h.as("leverage"), e.as("resid"), cook.as("cook_d"))
      .orderBy(col("cook_d").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(k)
  }

  /** JARQUE–BERA NORMALITY TEST (Jarque & Bera 1980, public) on q251's
    * seasonal residual — "is what's left after trend+season Gaussian?",
    * the distributional companion of q261's DW/runs whiteness audit (a
    * residual can be serially white yet heavy-tailed; JB catches exactly
    * that). ONE corpus-shaped pass: raw power sums Σx..Σx⁴ of the
    * DOLLAR-scaled residual fold 6-decimal-quantized in DECIMAL(38,6)
    * (dollars keep x⁴ sums ≈ 10²⁸ inside the 32 integer digits; 6
    * decimals sit far below double ULP at these magnitudes, so the
    * quantization is lossless), central moments come from the one-pass
    * expansion (m₂ = q₂−m², m₃ = q₃−3mq₂+2m³, m₄ = q₄−4mq₃+6m²q₂−3m⁴),
    * and skewness/kurtosis/JB are fixed trees. JB = n/6·(S² + (K−3)²/4),
    * reject at the χ²₂ 5% point 5.991.
    */
  def jarqueBera(spark: SparkSession, sfDir: String): DataFrame = {
    def q6(c: Column): Column = c.cast("string").cast(DecimalType(38, 6))
    val x = col("residual") / 100.0
    val sums = TimeSeries.seasonalDecompose(spark, sfDir)
      .select(x.as("x"))
      .agg(count(lit(1)).as("n"),
        sum(q6(col("x"))).as("s1"),
        sum(q6(col("x") * col("x"))).as("s2"),
        sum(q6(col("x") * col("x") * col("x"))).as("s3"),
        sum(q6(col("x") * col("x") * col("x") * col("x"))).as("s4"))
    val nD = col("n").cast("double")
    def b(name: String) = Num.decToDouble(col(name))
    val m = b("s1") / nD
    val q2 = b("s2") / nD
    val q3 = b("s3") / nD
    val q4 = b("s4") / nD
    val m2 = q2 - m * m
    val m3 = q3 - lit(3.0) * m * q2 + lit(2.0) * m * m * m
    val m4 = q4 - lit(4.0) * m * q3 + lit(6.0) * m * m * q2 -
      lit(3.0) * m * m * m * m
    val skew = m3 / sqrt(m2 * m2 * m2)
    val kurt = m4 / (m2 * m2)
    val jb = nD / lit(6.0) * (skew * skew +
      (kurt - 3.0) * (kurt - 3.0) / lit(4.0))
    sums.select(col("n").as("n_days"), m2.as("m2"), skew.as("skewness"),
      kurt.as("kurtosis"), jb.as("jb_stat"),
      (jb > 5.991).as("reject_normal_05"))
  }

  /** WELCH'S t-TEST (Welch 1947, public) between the urgent and low
    * priority order-total samples — the unequal-variance two-sample
    * location test beside q204's rank-sum (same two samples as q203/q204,
    * so the three tests triangulate one comparison): exact cents moments
    * per group (Σx BIGINT, Σx² DECIMAL/HUGEINT, VARCHAR-bridged), sample
    * variances v = (Σx² − (Σx)²/n)/(n−1), t = (m₁−m₂)/√(v₁/n₁ + v₂/n₂),
    * and the Welch–Satterthwaite df — all fixed trees after two exact
    * group folds in ONE aggregate over the fact table.
    */
  def welchT(spark: SparkSession, sfDir: String): DataFrame = {
    val xDec = col("x").cast(DecimalType(18, 0))
    val g = Tables.orders(spark, sfDir)
      .select((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long").as("x"), col("o_orderpriority").as("grp"))
      .filter(col("grp").isin("1-URGENT", "5-LOW"))
      .withColumn("is1", (col("grp") === "1-URGENT").cast("long"))
      .agg(
        sum(col("is1")).as("n1"), sum(lit(1L) - col("is1")).as("n2"),
        sum(col("is1") * col("x")).as("sx1"),
        sum((lit(1L) - col("is1")) * col("x")).as("sx2"),
        sum(col("is1").cast(DecimalType(18, 0)) * xDec * xDec).as("ss1"),
        sum((lit(1L) - col("is1")).cast(DecimalType(18, 0)) * xDec * xDec).as("ss2"))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val m1 = col("sx1").cast("double") / n1
    val m2 = col("sx2").cast("double") / n2
    val v1 = (Num.decToDouble(col("ss1")) -
      col("sx1").cast("double") * col("sx1").cast("double") / n1) / (n1 - 1.0)
    val v2 = (Num.decToDouble(col("ss2")) -
      col("sx2").cast("double") * col("sx2").cast("double") / n2) / (n2 - 1.0)
    val se2 = v1 / n1 + v2 / n2
    val t = (m1 - m2) / sqrt(se2)
    val df = se2 * se2 /
      ((v1 / n1) * (v1 / n1) / (n1 - 1.0) + (v2 / n2) * (v2 / n2) / (n2 - 1.0))
    g.select(col("n1"), col("n2"), m1.as("mean1_cents"), m2.as("mean2_cents"),
      t.as("t_stat"), df.as("df_welch"),
      (abs(t) > 1.96).as("reject_05_normal_approx"))
  }

  def benfordDigits(spark: SparkSession, sfDir: String): DataFrame = {
    val expected = Seq(
      1 -> "0.301029995664", 2 -> "0.176091259056", 3 -> "0.124938736608",
      4 -> "0.096910013008", 5 -> "0.079181246048", 6 -> "0.066946789631",
      7 -> "0.057991946978", 8 -> "0.051152522447", 9 -> "0.045757490561")
    val expCol = expected.foldLeft(lit(null).cast("double")) {
      case (acc, (d, p)) => when(col("digit") === d, lit(p).cast("double")).otherwise(acc)
    }
    val byDigit = Tables.orders(spark, sfDir)
      .select(substring(col("o_totalprice").cast(DecimalType(18, 2))
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      .withColumn("exp_p", expCol)
    val tot = byDigit.agg(sum(col("n_obs")).as("n_total"))
    val nD = col("n_total").cast("double")
    val expN = nD * col("exp_p")
    val term = (col("n_obs").cast("double") - expN) * (col("n_obs").cast("double") - expN) / expN
    val all9 = Window.partitionBy(lit(0))
    byDigit.crossJoin(broadcast(tot))
      .withColumn("obs_p", col("n_obs").cast("double") / nD)
      .withColumn("chi2_term", term)
      .withColumn("termq", term.cast("string").cast(DecimalType(28, 12)))
      .withColumn("chi2_total", Num.decToDouble(sum(col("termq")).over(all9)))
      .select(col("digit"), col("n_obs"), col("n_total"), col("obs_p"),
        col("exp_p"), col("chi2_term"), col("chi2_total"))
  }
}
