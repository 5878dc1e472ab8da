package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{Num, Tables}

/** Time-series diagnostics over the daily revenue series and per-user event
  * streams — the signal-shape tier (memory, smoothing, burstiness,
  * seasonality) beside [[Statistics]]' point alarms (z-spike, CUSUM).
  * Everything reduces the fact table ONCE (per-day or per-user aggregates,
  * map-side combined); all series arithmetic then runs on calendar- or
  * user-sized frames. Exactness contract: series values live in integer
  * CENTS or MICROSECONDS, deviation algebra is n-scaled (never divide by n
  * mid-stream — the q196 trick), and only final statistics cross to double
  * through fixed correctly-rounded trees or the VARCHAR bridge.
  */
object TimeSeries {

  /** Daily order revenue in integer cents, plus its positional index (a
    * |days|-row window over aggregated input — the sanctioned class).
    */
  private def dailyCents(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(to_date(col("o_orderdate")).as("day"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("x"))

  /** AUTOCORRELATION FUNCTION of daily revenue at lags 1..`maxLag` — the
    * "does yesterday predict today" diagnostic read before any forecasting
    * model. EXACT: with S = Σx and n the day count, the mean-centered
    * products scale by n² into integers — (n·xₜ − S)(n·xₜ₊ₗ − S) — so
    * numerator and denominator fold exactly in DECIMAL(38,0) (the oracle
    * uses HUGEINT; both are exact, and both bridge through VARCHAR into
    * one final double division). r_L = Σₜ devₜ·devₜ₊ₗ / Σₜ devₜ² — the
    * standard sample ACF, denominator over ALL n days. Scale shape: one
    * per-day aggregate over the fact table; the lag pairing is a
    * |days|×maxLag self-join on positional index — calendar-sized however
    * big the facts.
    */
  def revenueAcf(spark: SparkSession, sfDir: String, maxLag: Int = 7): DataFrame = {
    val daily = dailyCents(spark, sfDir)
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val idx = daily.crossJoin(broadcast(tot))
      .withColumn("i", row_number().over(Window.orderBy(col("day"))).cast("long"))
      .withColumn("dev", (col("n") * col("x") - col("s")).cast(DecimalType(38, 0)))
      .select(col("i"), col("dev"))
    val den = idx.agg(sum((col("dev") * col("dev")).cast(DecimalType(38, 0))).as("den"))
    val lags = spark.range(1, maxLag + 1L).select(col("id").as("lag"))
    idx.as("a").crossJoin(broadcast(lags))
      .join(idx.as("b"), col("b.i") === col("a.i") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("a.dev") * col("b.dev")).cast(DecimalType(38, 0))).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        (Num.decToDouble(col("num")) / Num.decToDouble(col("den"))).as("acf"))
  }

  /** PARTIAL AUTOCORRELATION at lags 1–3 via the Durbin–Levinson recursion
    * (Durbin 1960 / Levinson 1947, public), UNROLLED over [[revenueAcf]]'s
    * hash-gated ACF values — the other half of the Box–Jenkins order-
    * selection readout (ACF says MA order, PACF says AR order):
    *   φ₁₁ = r₁;  φ₂₂ = (r₂ − r₁²)/(1 − r₁²);  φ₂₁ = r₁ − φ₂₂·r₁;
    *   φ₃₃ = (r₃ − φ₂₁·r₂ − φ₂₂·r₁)/(1 − φ₂₁·r₁ − φ₂₂·r₂).
    * The recursion is inherently sequential, but at FIXED small depth it is
    * a handful of fixed double trees over already-cross-engine-identical
    * doubles — the same trade q248's bounded unroll makes. Scale shape:
    * inherits q210's entirely (the pivot and algebra run on a ≤7-row
    * frame).
    */
  def pacf(spark: SparkSession, sfDir: String): DataFrame = {
    val r = revenueAcf(spark, sfDir).agg(
      min(when(col("lag") === 1, col("acf"))).as("r1"),
      min(when(col("lag") === 2, col("acf"))).as("r2"),
      min(when(col("lag") === 3, col("acf"))).as("r3"))
    val phi22 = (col("r2") - col("r1") * col("r1")) /
      (lit(1.0) - col("r1") * col("r1"))
    val phi21 = col("r1") - phi22 * col("r1")
    val phi33 = (col("r3") - phi21 * col("r2") - phi22 * col("r1")) /
      (lit(1.0) - phi21 * col("r1") - phi22 * col("r2"))
    r.select(explode(array(
        struct(lit(1L).as("lag"), col("r1").as("acf"), col("r1").as("pacf")),
        struct(lit(2L).as("lag"), col("r2").as("acf"), phi22.as("pacf")),
        struct(lit(3L).as("lag"), col("r3").as("acf"), phi33.as("pacf"))))
        .as("e"))
      .select(col("e.lag").as("lag"), col("e.acf").as("acf"),
        col("e.pacf").as("pacf"))
  }

  /** EXPONENTIALLY-WEIGHTED MOVING SUM of daily revenue, α = 1/2, window
    * truncated at `maxLag` terms — smoothing WITHOUT the sequential
    * recursion: s̃ₜ = Σ_{j<maxLag} 2^{-(j+1)}·xₜ₋ⱼ. The recursion
    * sₜ = (xₜ + sₜ₋₁)/2 is inherently serial; spelled as a truncated
    * convolution it is one EXPLODE (each day contributes to its next
    * `maxLag` positions) plus one aggregate — embarrassingly parallel, and
    * the truncation error is < 2^-40 of a term, far below cent resolution.
    * Determinism: each term xᵢ·2^{-(j+1)} is an EXACT double (a power-of-2
    * scaling of a 31-bit integer; the weight comes from an integer shift,
    * not libm pow); terms and weights quantize to DECIMAL(28,12) and fold
    * exactly, so accumulation order never matters. `ewma_norm_cents`
    * re-normalizes by the folded weight mass (ramp-up days have fewer
    * terms). Scale shape: per-day aggregate, then |days|×maxLag rows.
    */
  def ewmaRevenue(spark: SparkSession, sfDir: String, maxLag: Int = 40): DataFrame = {
    val daily = dailyCents(spark, sfDir)
      .withColumn("i", row_number().over(Window.orderBy(col("day"))).cast("long"))
    val offsets = spark.range(0, maxLag.toLong).select(col("id").as("j"))
    // integer shift, not libm pow: 2^-(j+1) as 1.0 / (1L << (j+1)) is exact
    val w = lit(1.0) /
      expr("shiftleft(cast(1 as bigint), cast(j + 1 as int))").cast("double")
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(28, 12))
    val contrib = daily.select(col("i"), col("x")).crossJoin(broadcast(offsets))
      .select((col("i") + col("j")).as("i"),
        q12(col("x").cast("double") * w).as("termq"), q12(w).as("wq"))
    val smoothed = contrib.groupBy(col("i"))
      .agg(count(lit(1)).as("n_terms"),
        Num.decToDouble(sum(col("termq"))).as("ewma_cents"),
        Num.decToDouble(sum(col("wq"))).as("w_mass"))
    daily.join(smoothed, "i")
      .select(col("day"), col("x").as("total_cents"), col("n_terms"),
        col("ewma_cents"), (col("ewma_cents") / col("w_mass")).as("ewma_norm_cents"))
  }

  /** PER-USER BURSTINESS of the event stream (Goh & Barabási 2008, public):
    * B = (σ − μ)/(σ + μ) over inter-event gaps — B→1 bursty, 0 Poisson,
    * →−1 periodic; the behavioral fingerprint that separates bots from
    * humans. Gaps are EXACT integer MICROSECONDS (a lag window per user —
    * partitioned, totalized by (ts, event_id)); per-user Σg and Σg² fold
    * exactly (Σg² in DECIMAL(38,0) / HUGEINT), the population variance is
    * the n-scaled integer n·Σg² − (Σg)², and σ, μ, CV and B are one fixed
    * correctly-rounded tree after the VARCHAR bridge. One shuffle (by
    * user), one aggregate — nothing global anywhere.
    */
  def userBurstiness(spark: SparkSession, sfDir: String, minGaps: Int = 2): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("t_us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("gap", col("t_us") - lag(col("t_us"), 1).over(w))
      .filter(col("gap").isNotNull)
    val s = gaps.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_gaps"),
      sum(col("gap")).as("sg"),
      sum((col("gap").cast(DecimalType(38, 0)) * col("gap")).cast(DecimalType(38, 0))).as("sgg"))
      .filter(col("n_gaps") >= minGaps)
    val nD = col("n_gaps").cast("double")
    val mean = col("sg").cast("double") / nD
    val sd = sqrt(Num.decToDouble(
      (col("n_gaps") * col("sgg") - col("sg").cast(DecimalType(38, 0)) * col("sg"))
        .cast(DecimalType(38, 0)))) / nD
    s.select(col("user_id"), col("n_gaps"),
      mean.as("mean_gap_us"), sd.as("sd_gap_us"),
      (sd / mean).as("cv"), ((sd - mean) / (sd + mean)).as("burstiness"))
  }

  /** THEIL–SEN ROBUST TREND of daily revenue: the median of all pairwise
    * slopes (Theil 1950 / Sen 1968, public) — the regression line outliers
    * cannot drag, the robust companion to q143's least squares. Slopes are
    * one exact division per day pair ((centsⱼ−centsᵢ)/(dayⱼ−dayᵢ), both
    * exact longs); the MEDIAN over the ~|days|²/2 slopes is selected by the
    * q184 TWO-PHASE RANK (value-range buckets + offset ranks), so no task
    * ever sorts the pair set — the naive spelling is a single-task sort of
    * millions of rows. The intercept is the lower median of the residuals
    * x − slope·day (a second, |days|-sized selection). At extreme |days|
    * the standard refinement is sampled pairs (documented); the slope
    * estimator stays consistent.
    */
  def theilSen(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = dailyCents(spark, sfDir)
      .withColumn("dn", datediff(col("day"), lit("1990-01-01").cast("date")).cast("long"))
      .select(col("dn"), col("x"))
    // MATERIALIZE the O(d²) slope pairs once: the two-phase rank chain
    // reads them four times (range agg, per-bucket offsets, the ranked
    // pass, and the broadcast of the filtered median row re-executes the
    // lineage yet again) — without the persist the day-pair join and its
    // slope projection run 4–5×, which profiled as ~⅔ of q221's clean
    // 9.1 s. ~50 MB at calendar scale (d ≈ 2400 → 2.9M narrow rows);
    // unpersisted after the eager checkpoint of the 1-row result below.
    val pairs0 = daily.as("a").join(daily.as("b"), col("b.dn") > col("a.dn"))
      .select((col("a.dn") * 100000L + col("b.dn")).as("pid"),
        ((col("b.x") - col("a.x")).cast("double") /
          (col("b.dn") - col("a.dn")).cast("double")).as("slope"))
    val pairs = pairs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // LOAD-BEARING INVARIANT: dailyCents groups by day, so `daily` holds
    // exactly ONE row per day — that is what makes nd the distinct-day
    // count and n = nd·(nd−1)/2 exactly |pairs| (the b.dn > a.dn join).
    // A future dailyCents change emitting multiple rows per day would make
    // this rank selection pick the wrong median, not fail — keep the
    // one-row-per-day contract (pinned by TimeSeriesSpec's median check)
    // or restore a pairs.count() here.
    val nd = daily.count() // the only count job: n_pairs = d·(d−1)/2 of it
    val n = nd * (nd - 1) / 2
    val mid = (n + 1) / 2
    val slope = Relational.twoPhaseRankSketch(pairs, "slope", "pid", "rk")
      .filter(col("rk") === mid)
      .select(col("slope"), lit(n).as("n_pairs"))
    val resid = daily.crossJoin(broadcast(slope))
      .select(col("dn"), col("x"), col("slope"), col("n_pairs"),
        (col("x").cast("double") - col("slope") * col("dn").cast("double")).as("r"))
    // eager checkpoint of the 1-row result, then release the pair blocks
    // (the TermStats persist-then-checkpoint discipline — never strand
    // cached blocks behind a lazily-consumed frame)
    val out = resid
      .withColumn("rr", row_number().over(
        Window.orderBy(col("r"), col("dn"))))
      .filter(col("rr") === (nd + 1) / 2)
      .select(col("n_pairs"), col("slope").as("slope_cents_per_day"),
        col("r").as("intercept_cents"))
      .localCheckpoint(true)
    pairs.unpersist()
    out
  }

  /** MANN–KENDALL TREND TEST on daily revenue (Mann 1945 / Kendall 1975,
    * public) — the nonparametric monotone-trend detector beside q221's
    * Theil–Sen slope (the two are the canonical pair: MK says WHETHER the
    * trend is significant, Theil–Sen says HOW STEEP):
    *
    *   S = Σ_{i<j} sign(x_j − x_i)          (exact integer)
    *   Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18   (tie-corrected)
    *   z = (S∓1)/√Var(S)                    (continuity-corrected)
    *
    * Every count is an exact integer (the sign is an explicit CASE over
    * long cents, never a double signum); the variance NUMERATOR stays an
    * exact long (n ≤ calendar days, so n³ ≲ 10¹⁰ ≪ 2⁶³) and only the final
    * /18 and the z tree are doubles — fixed correctly-rounded trees, no
    * bridging needed. Scale shape: q221's calendar-bounded O(d²) day-pair
    * join over the AGGREGATED daily frame (the documented Theil–Sen trade);
    * ties and n are two tiny aggregates on the same frame.
    */
  def mannKendall(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = dailyCents(spark, sfDir)
      .withColumn("dn", datediff(col("day"), lit("1990-01-01").cast("date")).cast("long"))
      .select(col("dn"), col("x"))
    val sAgg = daily.as("a").join(daily.as("b"), col("b.dn") > col("a.dn"))
      .agg(coalesce(sum(
        when(col("b.x") > col("a.x"), 1L)
          .when(col("b.x") < col("a.x"), -1L)
          .otherwise(0L)), lit(0L)).as("s_stat"))
    val ties = daily.groupBy(col("x"))
      .agg(count(lit(1)).as("t"))
      .agg(count(lit(1)).as("n_days"),
        coalesce(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5)),
          lit(0L)).as("tie_term"))
    val varNum = col("n_days") * (col("n_days") - 1) *
      (lit(2L) * col("n_days") + 5) - col("tie_term")
    val varS = varNum.cast("double") / lit(18.0)
    val z = when(col("s_stat") > 0,
        (col("s_stat") - 1).cast("double") / sqrt(varS))
      .when(col("s_stat") < 0,
        (col("s_stat") + 1).cast("double") / sqrt(varS))
      .otherwise(lit(0.0))
    sAgg.crossJoin(broadcast(ties))
      .select(col("n_days"), col("s_stat"), varNum.as("var_numer"),
        z.as("z"), (abs(z) > 1.96).as("trend_at_95"))
  }

  /** SEASONAL MANN–KENDALL (Hirsch & Slack 1984, public) — the
    * weekly-seasonal variant of q256: an S statistic per day-of-week
    * SERIES (pairs compare only Mondays with Mondays, …), summed with
    * summed tie-corrected variances, so a strong weekly cycle can neither
    * fake nor mask a monotone trend the way it can in the unstratified
    * test. Arithmetic contract identical to q256 (sign an explicit CASE
    * over long cents; per-season variance NUMERATORS exact BIGINT, /18
    * deferred past the total). Output: one row per dow (its nₛ, Sₛ,
    * variance numerator) with the combined S', total variance numerator
    * and continuity-corrected z repeated — the q243 repeated-total
    * convention. Scale shape: the q221/q256 day-pair join further gated by
    * dow equality (≈ d²/14 pairs), all over the aggregated daily frame.
    */
  def seasonalMannKendall(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = dailyCents(spark, sfDir)
      .withColumn("dn", datediff(col("day"), lit("1990-01-01").cast("date")).cast("long"))
      .withColumn("dow", (col("dn") % 7).cast("long"))
      .select(col("dn"), col("dow"), col("x"))
    val sPer = daily.as("a")
      .join(daily.as("b"), col("b.dow") === col("a.dow") && col("b.dn") > col("a.dn"))
      .groupBy(col("a.dow").as("dow"))
      .agg(coalesce(sum(
        when(col("b.x") > col("a.x"), 1L)
          .when(col("b.x") < col("a.x"), -1L)
          .otherwise(0L)), lit(0L)).as("s_dow"))
    val tiesPer = daily.groupBy(col("dow"), col("x"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_vals"), sum(col("t")).as("n_dow"),
        coalesce(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5)),
          lit(0L)).as("tie_term"))
    val perDow = sPer.join(tiesPer, "dow")
      .select(col("dow"), col("n_dow"), col("s_dow"),
        (col("n_dow") * (col("n_dow") - 1) * (lit(2L) * col("n_dow") + 5) -
          col("tie_term")).as("var_numer_dow"))
    val tot = perDow.agg(sum(col("s_dow")).as("s_total"),
      sum(col("var_numer_dow")).as("var_numer_total"))
    val varS = col("var_numer_total").cast("double") / lit(18.0)
    val z = when(col("s_total") > 0,
        (col("s_total") - 1).cast("double") / sqrt(varS))
      .when(col("s_total") < 0,
        (col("s_total") + 1).cast("double") / sqrt(varS))
      .otherwise(lit(0.0))
    perDow.crossJoin(broadcast(tot))
      .select(col("dow"), col("n_dow"), col("s_dow"), col("var_numer_dow"),
        col("s_total"), col("var_numer_total"),
        z.as("z"), (abs(z) > 1.96).as("trend_at_95"))
  }

  /** DURBIN–WATSON + WALD–WOLFOWITZ RUNS TEST on [[seasonalDecompose]]'s
    * residual — "is anything left after trend and seasonality?": DW =
    * Σ(eₜ−eₜ₋₁)²/Σeₜ² probes lag-1 autocorrelation, the runs test probes
    * sign-pattern randomness; together they are the residual-whiteness
    * audit run before trusting the q254 alarms. Determinism: the residual
    * (cross-engine-identical, q251 is hash-gated) quantizes to 12 decimals;
    * differences stay exact decimal, each SQUARE is a fixed double tree
    * over the bridged exact operand, and squares fold 12-decimal-quantized
    * (the q233 recipe). Signs are explicit CASE over the exact decimal (a
    * quantized-zero residual drops out, the standard runs-test convention);
    * runs count via lag over the day-ordered nonzero frame; z =
    * (R−μ)/σ with μ = 2n₊n₋/n + 1, σ² = (μ−1)(μ−2)/(n−1) — exact-integer
    * inputs, one fixed tree. Scale shape: inherits q251's (one corpus
    * aggregate; calendar-sized windows after).
    */
  def residualDiagnostics(spark: SparkSession, sfDir: String): DataFrame = {
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(24, 12))
    def q12w(c: Column): Column = c.cast("string").cast(DecimalType(38, 12))
    val res = seasonalDecompose(spark, sfDir)
      .select(col("day"), q12(col("residual")).as("e"))
    val w = Window.orderBy(col("day"))
    val sq = res.withColumn("e_prev", lag(col("e"), 1).over(w))
      .select(
        q12w(Num.decToDouble(col("e")) * Num.decToDouble(col("e"))).as("e2"),
        when(col("e_prev").isNotNull,
          q12w(Num.decToDouble(col("e") - col("e_prev")) *
            Num.decToDouble(col("e") - col("e_prev")))).as("d2"))
      .agg(sum(col("e2")).as("sum_e2"), sum(col("d2")).as("sum_d2"),
        count(lit(1)).as("n_days"))
    val signs = res.withColumn("s",
        when(col("e") > 0, 1L).when(col("e") < 0, -1L).otherwise(0L))
      .filter(col("s") =!= 0L)
    val runs = signs.withColumn("s_prev", lag(col("s"), 1).over(w))
      .agg(count(lit(1)).as("n_signed"),
        sum(when(col("s") === 1L, 1L).otherwise(0L)).as("n_pos"),
        (lit(1L) + sum(when(col("s_prev").isNotNull && col("s") =!= col("s_prev"),
          1L).otherwise(0L))).as("n_runs"))
      .withColumn("n_neg", col("n_signed") - col("n_pos"))
    val nD = col("n_signed").cast("double")
    val mu = lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double") /
      nD + lit(1.0)
    val sigma = sqrt((mu - 1.0) * (mu - 2.0) / (nD - 1.0))
    sq.crossJoin(broadcast(runs))
      .select(col("n_days"),
        (Num.decToDouble(col("sum_d2")) / Num.decToDouble(col("sum_e2"))).as("dw"),
        col("n_pos"), col("n_neg"), col("n_runs"), mu.as("mu_runs"),
        ((col("n_runs").cast("double") - mu) / sigma).as("z_runs"))
  }

  /** Daily revenue (cents) AND order count — the paired series for the
    * lead–lag diagnostics ([[crossCorrelation]], [[kendallTau]]).
    */
  private def dailyCentsCount(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(to_date(col("o_orderdate")).as("day"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("x"), count(lit(1)).as("y"))
      .withColumn("dn", datediff(col("day"), lit("1990-01-01").cast("date")).cast("long"))

  /** LAGGED CROSS-CORRELATION between daily order count and daily revenue
    * at lags −`maxLag`..+`maxLag` — the lead–lag diagnostic ("do busy days
    * predict rich days?") beside q210's single-series ACF, and computed by
    * the same n-scaling trick: deviations scale by n into exact integers
    * (aₜ = n·xₜ − Σx, bₜ = n·yₜ − Σy), the per-lag numerator Σ aₜ·bₜ₊ₗ and
    * the full-series denominators Σa², Σb² fold exactly in DECIMAL(38,0)
    * (HUGEINT in the oracle — products pass 2⁶³), and rₗ is ONE double
    * division after the VARCHAR bridge. Scale shape: one per-day aggregate
    * over the fact table; the lag pairing is |days|×(2·maxLag+1) — a join
    * against a constant 15-row lag frame, calendar-sized forever.
    */
  def crossCorrelation(spark: SparkSession, sfDir: String, maxLag: Int = 7): DataFrame = {
    val daily = dailyCentsCount(spark, sfDir)
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"))
    val dev = daily.crossJoin(broadcast(tot))
      .select(col("dn"), (col("n") * col("x") - col("sx")).as("ax"),
        (col("n") * col("y") - col("sy")).as("ay"))
    val d38 = DecimalType(38, 0)
    val den = dev.agg(
      sum(col("ax").cast(d38) * col("ax").cast(d38)).as("dax"),
      sum(col("ay").cast(d38) * col("ay").cast(d38)).as("day_"))
    val lags = spark.range(-maxLag.toLong, maxLag + 1L).select(col("id").as("lag"))
    val num = dev.as("a").crossJoin(broadcast(lags))
      .join(dev.as("b"), col("b.dn") === col("a.dn") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("a.ay").cast(d38) * col("b.ax").cast(d38)).as("num"))
    num.crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        (Num.decToDouble(col("num")) /
          sqrt(Num.decToDouble(col("dax")) * Num.decToDouble(col("day_"))))
          .as("r"))
  }

  /** TREND / SEASONAL STRENGTH of the daily series (the Wang–Smith–Hyndman
    * decomposition-strength measures, public — the STL features read before
    * choosing a forecasting model): F_T = max(0, 1 − Var(R)/Var(T+R)) with
    * T+R = x − S the deseasonalized series, F_S = max(0, 1 − Var(R)/
    * Var(S+R)) with S+R = x − T the detrended one — both straight off
    * [[seasonalDecompose]]'s hash-gated columns. Determinism: each series'
    * Σv and Σv² fold 12-decimal-quantized (squares are fixed double trees
    * over bridged operands); population variances spell (ss − s²/n)/n
    * identically in both engines. Calendar-sized end to end after q251's
    * one corpus aggregate.
    */
  def decompositionStrength(spark: SparkSession, sfDir: String): DataFrame = {
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(24, 12))
    def q12w(c: Column): Column = c.cast("string").cast(DecimalType(38, 12))
    val base = seasonalDecompose(spark, sfDir)
      .select(q12(col("residual")).as("r"),
        q12(col("x").cast("double") - col("seasonal")).as("tr"),
        q12(col("x").cast("double") - col("trend")).as("sr"))
    def sq(c: Column): Column = q12w(Num.decToDouble(c) * Num.decToDouble(c))
    val m = base.agg(count(lit(1)).as("n"),
      sum(col("r")).as("s_r"), sum(sq(col("r"))).as("ss_r"),
      sum(col("tr")).as("s_tr"), sum(sq(col("tr"))).as("ss_tr"),
      sum(col("sr")).as("s_sr"), sum(sq(col("sr"))).as("ss_sr"))
    val nD = col("n").cast("double")
    def variance(s: String, ss: String): Column =
      (Num.decToDouble(col(ss)) -
        Num.decToDouble(col(s)) * Num.decToDouble(col(s)) / nD) / nD
    val vR = variance("s_r", "ss_r")
    val vTr = variance("s_tr", "ss_tr")
    val vSr = variance("s_sr", "ss_sr")
    m.select(col("n").as("n_days"), vR.as("var_resid"),
      vTr.as("var_deseasonalized"), vSr.as("var_detrended"),
      greatest(lit(0.0), lit(1.0) - vR / vTr).as("trend_strength"),
      greatest(lit(0.0), lit(1.0) - vR / vSr).as("seasonal_strength"))
  }

  /** KENDALL'S τ-b between daily revenue and daily order count (Kendall
    * 1945's tie-corrected form, public) — the rank-correlation companion of
    * [[crossCorrelation]]'s lag-0 Pearson: concordances over the
    * calendar-bounded day-pair join (the q221/q256 frame), every count an
    * exact integer — the sign product is an explicit nested CASE, tie
    * terms t(t−1)/2 fold as BIGINTs (pair counts ≈ d²/2 ≲ 10⁷ for calendar
    * d) — and τ_b = (n_c − n_d)/√((n₀−n₁)(n₀−n₂)) is one fixed double
    * tree. Scale shape: the documented Theil–Sen trade — O(d²) pairs of
    * the AGGREGATED daily frame, corpus touched once.
    */
  def kendallTau(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = dailyCentsCount(spark, sfDir).select(col("dn"), col("x"), col("y"))
    def sgn(b: Column, a: Column): Column =
      when(b > a, 1L).when(b < a, -1L).otherwise(0L)
    val pairs = daily.as("a").join(daily.as("b"), col("b.dn") > col("a.dn"))
      .agg(count(lit(1)).as("n0"),
        coalesce(sum(sgn(col("b.x"), col("a.x")) * sgn(col("b.y"), col("a.y"))),
          lit(0L)).as("s"),
        coalesce(sum(when(col("b.x") === col("a.x"), 1L).otherwise(0L)), lit(0L))
          .as("n1"),
        coalesce(sum(when(col("b.y") === col("a.y"), 1L).otherwise(0L)), lit(0L))
          .as("n2"))
    val tau = col("s").cast("double") /
      sqrt((col("n0") - col("n1")).cast("double") *
        (col("n0") - col("n2")).cast("double"))
    pairs.select(col("n0").as("n_pairs"), col("s").as("s_stat"),
      col("n1").as("ties_x"), col("n2").as("ties_y"), tau.as("tau_b"))
  }

  /** KAPLAN–MEIER SURVIVAL over customer lifetimes (Kaplan & Meier 1958,
    * public): duration = days between a customer's first and last order;
    * a customer whose last order falls within `censorDays` of the data
    * horizon is CENSORED (still alive), otherwise the lifetime ended — the
    * churn curve every retention team reads. The product-limit estimator
    * S(t) = Π_{tᵢ≤t} (1 − dᵢ/rᵢ) is spelled as exp(Σ ln(1−dᵢ/rᵢ)): each
    * log term is bounded in (−∞, 0] with small magnitude, 12-decimal
    * bridged and folded exactly, and exp's output lives in (0, 1] — both
    * transcendentals inside the magnitude-safe regime (SURVEY §8.4 rule).
    * Risk sets are suffix sums over the |distinct durations| aggregated
    * frame. One per-customer aggregate is the only corpus-sized job.
    */
  def kaplanMeier(spark: SparkSession, sfDir: String, censorDays: Int = 90): DataFrame = {
    val horizon = Tables.orders(spark, sfDir)
      .agg(max(to_date(col("o_orderdate"))).as("max_d"))
    val life = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(min(to_date(col("o_orderdate"))).as("first_d"),
        max(to_date(col("o_orderdate"))).as("last_d"))
      .crossJoin(broadcast(horizon))
      .select(datediff(col("last_d"), col("first_d")).cast("long").as("t"),
        (datediff(col("max_d"), col("last_d")) > censorDays).as("event"))
    val byT = life.groupBy(col("t")).agg(
      sum(when(col("event"), 1L).otherwise(0L)).as("d"),
      sum(when(!col("event"), 1L).otherwise(0L)).as("c"))
    val later = Window.orderBy(col("t")).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prior = Window.orderBy(col("t")).rowsBetween(Window.unboundedPreceding, 0)
    import org.apache.spark.sql.types.DecimalType
    val risk = byT.withColumn("n_risk", sum(col("d") + col("c")).over(later))
    val lnTerm = Num.decToDouble(
      log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double"))
        .cast(DecimalType(18, 12)))
    risk
      // d = n_risk empties the risk set (1 − d/r = 0, ln undefined): flag it
      // and pin survival to exactly 0 from that time on
      .withColumn("lnq",
        when(col("d") > 0 && col("d") < col("n_risk"),
          lnTerm.cast("string").cast(DecimalType(28, 12)))
          .otherwise(lit(0).cast(DecimalType(28, 12))))
      .withColumn("dead", when(col("d") === col("n_risk"), 1L).otherwise(0L))
      .withColumn("z", max(col("dead")).over(prior))
      .withColumn("survival",
        when(col("z") === 1, lit(0.0)).otherwise(Num.decToDouble(
          exp(Num.decToDouble(sum(col("lnq")).over(prior)))
            .cast(DecimalType(18, 12)))))
      .select(col("t").as("t_days"), col("n_risk"), col("d").as("n_events"),
        col("c").as("n_censored"), col("survival"))
  }

  /** ROLLING MEDIAN of daily revenue over the trailing 7 OBSERVED days —
    * the robust smoother beside the EWMA (q211): a single spiked day drags
    * any mean-based window, the median moves by at most one rank. ENTIRELY
    * integer: daily cents are exact longs, the window buffer is ≤ 7
    * elements, and the lower median is `sorted[(n+1) DIV 2]` — an observed
    * value, no interpolation, so the oracle matches bit-for-bit with zero
    * FP anywhere. The first `window−1` days report the median of their
    * shorter prefix (n_window says which), never NULL.
    * Scale shape: the window runs over the AGGREGATED daily frame (≤ a few
    * thousand rows per decade — the documented calendar-frame window
    * class), not raw orders; the only order-sized job is the first hash
    * aggregate.
    */
  def rollingMedianRevenue(spark: SparkSession, sfDir: String,
      window: Int = 7): DataFrame = {
    val w = Window.orderBy(col("day")).rowsBetween(-(window - 1), 0)
    dailyCents(spark, sfDir)
      .withColumn("buf", collect_list(col("x")).over(w))
      .select(col("day"), col("x"),
        size(col("buf")).cast("long").as("n_window"),
        // `/` on ints yields DOUBLE in the Column algebra; the cast back to
        // int truncates (n+1)/2 exactly — n ≤ window, no precision risk
        element_at(array_sort(col("buf")), ((size(col("buf")) + 1) / 2).cast("int"))
          .as("rolling_median_cents"))
  }

  /** NELSON–AALEN CUMULATIVE HAZARD over the q222 lifetimes — the
    * estimator survival analysis pairs with Kaplan–Meier (Nelson 1972 /
    * Aalen 1978, public): H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ over the same risk sets,
    * with the KM-consistency check exp(−H) ≈ S built into the output. Each
    * dᵢ/nᵢ is ONE division of exact ints; the cumulative sum folds
    * 12-decimal-quantized terms in EXACT decimal (order-free), and
    * exp(−H) rides the 12-decimal exp bridge — H ≤ ~10 keeps both bridges
    * in the magnitude-safe regime (§8.4). Shares [[kaplanMeier]]'s
    * suffix-sum risk-set machinery verbatim: one per-customer aggregate,
    * one |lifetimes|-row frame, both windows over that aggregated frame.
    */
  def nelsonAalen(spark: SparkSession, sfDir: String,
      censorDays: Int = 90): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val horizon = Tables.orders(spark, sfDir)
      .agg(max(to_date(col("o_orderdate"))).as("max_d"))
    val life = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(min(to_date(col("o_orderdate"))).as("first_d"),
        max(to_date(col("o_orderdate"))).as("last_d"))
      .crossJoin(broadcast(horizon))
      .select(datediff(col("last_d"), col("first_d")).cast("long").as("t"),
        (datediff(col("max_d"), col("last_d")) > censorDays).as("event"))
    val byT = life.groupBy(col("t")).agg(
      sum(when(col("event"), 1L).otherwise(0L)).as("d"),
      sum(when(!col("event"), 1L).otherwise(0L)).as("c"))
    val later = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val prior = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, 0)
    byT
      .withColumn("n_risk", sum(col("d") + col("c")).over(later))
      .withColumn("hq",
        (col("d").cast("double") / col("n_risk").cast("double"))
          .cast("string").cast(DecimalType(28, 12)))
      .withColumn("cum_hazard",
        Num.decToDouble(sum(col("hq")).over(prior)))
      .select(col("t").as("t_days"), col("n_risk"), col("d").as("n_events"),
        col("c").as("n_censored"), col("cum_hazard"),
        // exp OUTPUT bridged at NINE decimals, not twelve: JVM and libm exp
        // can differ 1 ulp on identical input, and on (0,1] a 5e-13 grid
        // midpoint sits ~2e-4/row within an ulp (measured: one row of 1574
        // at sf0.1 flipped); the 9-decimal grid shrinks that to ~4e-7 (the
        // q195 lesson applied to exp)
        Num.decToDouble(exp(-col("cum_hazard")).cast(DecimalType(18, 9)))
          .as("surv_na"))
  }

  /** SEASONAL DECOMPOSITION (additive, STL-lite) of daily revenue:
    * x = trend + seasonal + residual, with trend the centered 7-observed-day
    * moving average, seasonal the per-day-of-week mean of the detrended
    * series (q213's engine-neutral dow arithmetic: days since a fixed
    * Monday mod 7), and residual the leftover — the decomposition a
    * forecasting pipeline runs before choosing a model, and the standard
    * pre-whitening for the q194/q196 anomaly alarms (a raw z-spike alarm
    * fires every weekend without it). Determinism: trend is ONE division of
    * exact longs (window sum / window count); `detrended` is a fixed
    * double tree; per-dow means fold SIX-decimal-quantized terms (values
    * ~10⁸ cents — the §8.4 magnitude rule puts the grid ~66× the ulp)
    * through exact decimal before one division; residual is a fixed tree.
    * Scale shape: both windows and the 7-group aggregate run over the
    * AGGREGATED daily frame (calendar-sized); raw orders reduce once.
    */
  def seasonalDecompose(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = dailyCents(spark, sfDir)
      .withColumn("dow",
        (datediff(col("day"), lit("1990-01-01").cast("date")) % 7).cast("long"))
    val w = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val trended = daily
      .withColumn("w_sum", sum(col("x")).over(w))
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("trend",
        col("w_sum").cast("double") / col("n_window").cast("double"))
      .withColumn("detrended", col("x").cast("double") - col("trend"))
    def q6(c: Column): Column = c.cast("string").cast(DecimalType(28, 6))
    val seasonal = trended.groupBy(col("dow"))
      .agg(Num.decToDouble(sum(q6(col("detrended")))).as("det_sum"),
        count(lit(1)).as("n_dow"))
      .select(col("dow"),
        (col("det_sum") / col("n_dow").cast("double")).as("seasonal"))
    trended.join(broadcast(seasonal), "dow")
      .select(col("day"), col("x"), col("n_window"), col("trend"), col("dow"),
        col("seasonal"),
        (col("detrended") - col("seasonal")).as("residual"))
  }

  /** CUSUM ON THE SEASONALLY ADJUSTED RESIDUAL — q196's mean-shift detector
    * run over [[seasonalDecompose]]'s residual instead of raw daily revenue
    * (the composition q251's scaladoc promises): the raw-series CUSUM
    * accumulates the weekly cycle itself, so a seasonal business never
    * quiets the alarm; pre-whitening first means the cumulative excess
    * measures genuine level shifts only.
    *
    * Determinism: the residual is already a cross-engine-identical double
    * (q251 is hash-gated); it enters the fold quantized to 12 decimals, and
    * from there the q196 algebra is verbatim in the exact-decimal domain —
    * dev = n·r − Σr (no division), prefix/run-min window sums, S = prefix −
    * min(run-min, 0). The alarm anchor is Σ|r| (the series' own total
    * absolute deviation — the residual's mean is ~0, so q196's
    * revenue-total anchor has no analogue): alarm when 10·S > n·Σ|r|, an
    * exact-decimal comparison. Operand precisions are pinned (residual →
    * DECIMAL(24,12), n → DECIMAL(6,0), Σ|r| → DECIMAL(30,12)) so neither
    * engine's decimal-arithmetic promotion rules round anything.
    *
    * Scale shape: inherits q251's (windows over the AGGREGATED daily frame;
    * raw orders touched once); everything here is calendar-sized.
    */
  def seasonalCusum(spark: SparkSession, sfDir: String): DataFrame = {
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(24, 12))
    val res = seasonalDecompose(spark, sfDir)
      .select(col("day"), col("residual"))
    val totals = res.agg(count(lit(1)).cast(DecimalType(6, 0)).as("n"),
      sum(q12(col("residual"))).as("rt"),
      sum(q12(abs(col("residual")))).cast(DecimalType(30, 12)).as("ra"))
    val w = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
    val zero = lit(0).cast(DecimalType(38, 12))
    res.crossJoin(broadcast(totals))
      .withColumn("dev",
        (col("n") * q12(col("residual")) - col("rt")).cast(DecimalType(38, 12)))
      .withColumn("prefix", sum(col("dev")).over(w))
      .withColumn("runmin", min(col("prefix")).over(w))
      // CASE, not least(): the q196 DuckDB least()-promotes-to-DOUBLE trap;
      // S re-pinned to (30,12) (magnitude ≤ days²·max|r| ≈ 10¹⁵) so the ×10
      // stays inside exact decimal under BOTH engines' promotion rules
      .withColumn("s2",
        (col("prefix") - when(col("runmin") < 0, col("runmin")).otherwise(zero))
          .cast(DecimalType(30, 12)))
      .select(col("day"), col("residual"),
        (Num.decToDouble(col("s2")) / col("n").cast("double")).as("cusum_excess"),
        (col("s2") * lit(10).cast(DecimalType(2, 0)) >
          col("n") * col("ra")).as("alarm"))
  }

  /** FORECAST BACKTEST of the [[ewmaRevenue]] smoother: yesterday's
    * normalized EWMA is today's one-step-ahead forecast, scored per month
    * with MAE, RMSE and MAPE — the walk-forward evaluation loop any
    * forecasting pipeline runs before trusting a model. Per-day errors are
    * fixed trees over already-deterministic doubles; the monthly means fold
    * 12-decimal-quantized terms exactly (accumulation order never
    * matters). Everything after the per-day aggregate runs on the
    * |days|-row frame.
    */
  /** Per-day one-step-ahead EWMA forecast errors — shared by
    * [[forecastBacktest]] and [[conformalForecast]].
    */
  private def dailyForecastErrors(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.orderBy(col("day"))
    ewmaRevenue(spark, sfDir)
      .withColumn("forecast", lag(col("ewma_norm_cents"), 1).over(w))
      .filter(col("forecast").isNotNull)
      .withColumn("e", col("total_cents").cast("double") - col("forecast"))
  }

  def forecastBacktest(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val scored = dailyForecastErrors(spark, sfDir)
      // relative error keeps every bridged square in [0, ~1] — the
      // magnitude-safe regime — at ANY scale factor; absolute cents are
      // reported un-squared (well under 10¹⁶ at any plausible SF)
      .withColumn("rel", col("e") / col("total_cents").cast("double"))
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(28, 12))
    val monthly = scored
      .groupBy(date_trunc("month", col("day")).cast("date").as("month"))
      .agg(count(lit(1)).as("n_days"),
        Num.decToDouble(sum(q12(abs(col("e"))))).as("sae"),
        Num.decToDouble(sum(q12(col("rel") * col("rel")))).as("ssr"),
        Num.decToDouble(sum(q12(abs(col("rel"))))).as("sar"))
    monthly.select(col("month"), col("n_days"),
      (col("sae") / col("n_days").cast("double")).as("mae_cents"),
      sqrt(col("ssr") / col("n_days").cast("double")).as("rmse_rel"),
      (col("sar") / col("n_days").cast("double")).as("mape"))
  }

  /** FORECASTER HEAD-TO-HEAD: the q223 EWMA one-step-ahead forecast vs an
    * AR(1) forecast x̂ₜ = m + φ·(xₜ₋₁ − m) with φ = r₁ (q210's hash-gated
    * lag-1 autocorrelation — the Yule–Walker AR(1) estimate) and m the
    * series mean, scored per month by MAE on the SAME days — the
    * model-selection loop run before promoting either forecaster (a
    * single-model backtest can look fine while losing to a one-line
    * alternative; q223 alone cannot see that). Per-day errors are fixed
    * double trees over the two arms' already-deterministic forecasts;
    * monthly MAE folds 12-decimal-quantized; the winner flag compares the
    * two folded sums (exact decimals) — never the divided doubles.
    * Scale shape: inherits q210/q223 (one per-day aggregate; calendar-
    * sized lag windows; the ~40-term EWMA convolution).
    */
  def forecastCompare(spark: SparkSession, sfDir: String): DataFrame = {
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(28, 12))
    val ew = dailyForecastErrors(spark, sfDir)
      .select(col("day"), col("total_cents"), abs(col("e")).as("ae_ewma"))
    val phi = revenueAcf(spark, sfDir).filter(col("lag") === 1)
      .select(col("acf").as("phi"))
    val daily = dailyCents(spark, sfDir)
    val m = daily.agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
    val w = Window.orderBy(col("day"))
    val ar = daily.crossJoin(broadcast(phi)).crossJoin(broadcast(m))
      .withColumn("mean", col("sx").cast("double") / col("n").cast("double"))
      .withColumn("x_prev", lag(col("x"), 1).over(w))
      .filter(col("x_prev").isNotNull)
      .select(col("day"),
        abs(col("x").cast("double") -
          (col("mean") + col("phi") *
            (col("x_prev").cast("double") - col("mean")))).as("ae_ar"))
    ew.join(ar, "day")
      .groupBy(date_trunc("month", col("day")).cast("date").as("month"))
      .agg(count(lit(1)).as("n_days"),
        sum(q12(col("ae_ewma"))).as("se"), sum(q12(col("ae_ar"))).as("sa"))
      .select(col("month"), col("n_days"),
        (Num.decToDouble(col("se")) / col("n_days").cast("double"))
          .as("mae_ewma_cents"),
        (Num.decToDouble(col("sa")) / col("n_days").cast("double"))
          .as("mae_ar1_cents"),
        (col("sa") < col("se")).as("ar1_wins"))
  }

  /** SPEARMAN RANK CORRELATION (Spearman 1904, public) between daily
    * revenue and daily order COUNT — the monotone-association readout that
    * is immune to the revenue distribution's heavy tail (Pearson on these
    * two series is dominated by a few spike days; ranks are not), and the
    * robustness companion to q264's Kendall τ on the same pair of series.
    * ENTIRELY exact until one final tree: ties take AVERAGE ranks, carried
    * as the INTEGER doubled rank r2 = 2·m + t + 1 (m = count of strictly
    * smaller values via one cumulative window over the per-value counts,
    * t = tie-group size), so Σu, Σu², Σuv are exact BIGINTs and ρ =
    * (nΣuv − ΣuΣv)/(√(nΣu² − (Σu)²)·√(nΣv² − (Σv)²)) is one fixed double
    * tree (the doubling cancels between numerator and denominator).
    * Scale shape: one per-day aggregate is the only corpus-sized job;
    * ranks and moments run on the calendar-sized frame (global windows
    * over aggregated input — the sanctioned class; magnitudes ~4n³ stay
    * far inside int64 for any calendar).
    */
  def spearman(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = dailyCents(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("c")), "day")
    def doubledRanks(v: String, out: String): DataFrame = {
      val below = Window.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, -1)
      daily.groupBy(col(v).as("__v")).agg(count(lit(1)).as("__t"))
        .select(col("__v"),
          (lit(2L) * coalesce(sum(col("__t")).over(below), lit(0L)) +
            col("__t") + 1L).as(out))
    }
    val rx = doubledRanks("x", "u")
    val rc = doubledRanks("c", "v")
    val j = daily
      .join(rx, daily("x") === rx("__v")).drop("__v")
      .join(rc, daily("c") === rc("__v")).drop("__v")
    val s = j.agg(count(lit(1)).as("n"),
      sum(col("u")).as("su"), sum(col("v")).as("sv"),
      sum(col("u") * col("u")).as("suu"),
      sum(col("v") * col("v")).as("svv"),
      sum(col("u") * col("v")).as("suv"))
    s.select(col("n").as("n_days"), col("suv"),
      ((col("n") * col("suv") - col("su") * col("sv")).cast("double") /
        (sqrt((col("n") * col("suu") - col("su") * col("su")).cast("double")) *
          sqrt((col("n") * col("svv") - col("sv") * col("sv")).cast("double"))))
        .as("rho"))
  }

  /** THEIL'S U₂ FORECAST SKILL (Theil 1966, public) for BOTH of q283's
    * arms against the naive x̂ₜ = xₜ₋₁ benchmark: U₂ = √(Σ((x̂ₜ−xₜ)/xₜ₋₁)² /
    * Σ((xₜ₋₁−xₜ)/xₜ₋₁)²) — U₂ < 1 means the model beats persistence, the
    * single number that decides whether a forecaster earns its complexity
    * (a model can win q283's head-to-head while still losing to doing
    * nothing). All three error series divide by xₜ₋₁, so every bridged
    * square lives in the magnitude-safe ~[0,1] regime at ANY scale factor
    * (the q223 relative-error lesson); each square quantizes to 12
    * decimals before the exact fold, and each U₂ is one bridged division
    * plus a √. Scale shape: inherits q283 (one per-day aggregate, then
    * calendar-sized frames).
    */
  def theilU(spark: SparkSession, sfDir: String): DataFrame = {
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(28, 12))
    val ew = dailyForecastErrors(spark, sfDir)
      .select(col("day"), col("forecast").as("f_ewma"))
    val phi = revenueAcf(spark, sfDir).filter(col("lag") === 1)
      .select(col("acf").as("phi"))
    val m = dailyCents(spark, sfDir)
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
    val w = Window.orderBy(col("day"))
    val base = dailyCents(spark, sfDir)
      .withColumn("x_prev", lag(col("x"), 1).over(w))
      .filter(col("x_prev").isNotNull)
      .crossJoin(broadcast(phi)).crossJoin(broadcast(m))
      .withColumn("mean", col("sx").cast("double") / col("n").cast("double"))
      .withColumn("f_ar", col("mean") +
        col("phi") * (col("x_prev").cast("double") - col("mean")))
      .join(ew, "day")
    def relSq(f: Column): Column = {
      val r = (f - col("x").cast("double")) / col("x_prev").cast("double")
      q12(r * r)
    }
    base.agg(count(lit(1)).as("n_days"),
        sum(relSq(col("f_ewma"))).as("sm_e"),
        sum(relSq(col("f_ar"))).as("sm_a"),
        sum(relSq(col("x_prev").cast("double"))).as("sm_n"))
      .select(col("n_days"),
        sqrt(Num.decToDouble(col("sm_e")) / Num.decToDouble(col("sm_n")))
          .as("u2_ewma"),
        sqrt(Num.decToDouble(col("sm_a")) / Num.decToDouble(col("sm_n")))
          .as("u2_ar1"))
  }

  /** WALD–WOLFOWITZ RUNS TEST (1940, public) for randomness of the daily-
    * revenue series around its own MEDIAN — the model-free "is this series
    * i.i.d. noise or does it trend/oscillate?" gate read before fitting
    * anything (too FEW runs ⇒ trending/clustered, too MANY ⇒ oscillating;
    * the nonparametric companion to q256's Mann–Kendall). ENTIRELY exact
    * until the final tree: the median rides the doubled order statistic
    * m2 = x₍ₖ₁₎ + x₍ₖ₂₎ (no division — 2x vs m2 comparisons stay in
    * BIGINT; equal-to-median days drop, the standard rule), runs count via
    * one lag over the day-ordered frame, and z = (R − μ)/σ with
    * μ = 2n₁n₂/n + 1, σ² = 2n₁n₂(2n₁n₂ − n)/(n²(n−1)) one fixed double
    * tree over exact integers. Scale shape: one per-day aggregate, then
    * calendar-sized windows (the sanctioned class).
    */
  def runsTest(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = dailyCents(spark, sfDir)
    val byVal = Window.orderBy(col("x"), col("day"))
    val ranked = daily.withColumn("r", row_number().over(byVal).cast("long"))
    val n = ranked.agg(count(lit(1)).as("n_all"))
    val med2 = ranked.crossJoin(broadcast(n))
      .agg(sum(when(col("r") === expr("(n_all + 1) div 2"), col("x"))
          .otherwise(0L)).as("m_lo"),
        sum(when(col("r") === expr("(n_all + 2) div 2"), col("x"))
          .otherwise(0L)).as("m_hi"))
      .select((col("m_lo") + col("m_hi")).as("m2"))
    val signed = daily.crossJoin(broadcast(med2))
      .withColumn("s", when(col("x") * 2L > col("m2"), 1L)
        .when(col("x") * 2L < col("m2"), -1L))
      .filter(col("s").isNotNull)
    val byDay = Window.orderBy(col("day"))
    val runs = signed
      .withColumn("prev", lag(col("s"), 1).over(byDay))
      .agg(sum(when(col("prev").isNull || col("prev") =!= col("s"), 1L)
          .otherwise(0L)).as("runs"),
        sum(when(col("s") === 1L, 1L).otherwise(0L)).as("n_above"),
        sum(when(col("s") === -1L, 1L).otherwise(0L)).as("n_below"))
    val n1d = col("n_above").cast("double")
    val n2d = col("n_below").cast("double")
    val nd = (col("n_above") + col("n_below")).cast("double")
    val mu = lit(2.0) * n1d * n2d / nd + lit(1.0)
    val sig2 = (lit(2.0) * n1d * n2d * (lit(2.0) * n1d * n2d - nd)) /
      (nd * nd * (nd - lit(1.0)))
    runs.select(col("n_above"), col("n_below"), col("runs"), mu.as("mu"),
      ((col("runs").cast("double") - mu) / sqrt(sig2)).as("z"))
  }

  /** INTER-ORDER GAP PROFILE per market segment — mean, population CV and
    * the Goh–Barabási burstiness B = (σ−μ)/(σ+μ) of the days between a
    * customer's consecutive orders, grouped by segment: the purchase-rhythm
    * readout (B→1 bursty campaign-driven buying, ≈0 Poisson, <0 periodic
    * replenishment) that q212 computes for the event stream, here at
    * ORDER/segment grain where retention and inventory decisions live.
    * Gaps are EXACT integer days (a per-customer lag window, totalized by
    * (date, orderkey)); per-segment Σg and Σg² fold exactly (Σg² in
    * DECIMAL(38,0) — safe at any corpus size); σ, μ, CV and B are one
    * fixed correctly-rounded tree per segment off the n-scaled integer
    * identity n·Σg² − (Σg)². One customer-shuffle, one join to the
    * customer dim (strategy left to AQE — the dim scales with SF), one
    * |segments|-row aggregate.
    */
  def orderGapProfile(spark: SparkSession, sfDir: String, minGaps: Int = 1): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("o_orderkey"))
    val gaps = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("day"))
      .withColumn("gap", datediff(col("day"), lag(col("day"), 1).over(w)).cast("long"))
      .filter(col("gap").isNotNull)
    val seg = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment").as("segment"))
    // customer scales with SF — no broadcast hint (r18 verdict item 6): AQE
    // broadcasts from measured size while the dim fits, shuffle-joins beyond
    val s = gaps.join(seg, "o_custkey")
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap")).as("sg"),
        sum((col("gap").cast(DecimalType(38, 0)) * col("gap"))
          .cast(DecimalType(38, 0))).as("sgg"))
      .filter(col("n_gaps") >= minGaps.toLong)
    val nD = col("n_gaps").cast("double")
    val mu = col("sg").cast("double") / nD
    // population variance via the exact integer n·Σg² − (Σg)², bridged
    val varNum = (col("n_gaps").cast(DecimalType(38, 0)) * col("sgg") -
      col("sg").cast(DecimalType(38, 0)) * col("sg").cast(DecimalType(38, 0)))
      .cast(DecimalType(38, 0))
    val sigma = sqrt(Num.decToDouble(varNum)) / nD
    s.select(col("segment"), col("n_gaps"), mu.as("mean_gap_days"),
      sigma.as("sd_gap_days"), (sigma / mu).as("cv"),
      ((sigma - mu) / (sigma + mu)).as("burstiness"))
  }

  /** MULTIPLICATIVE SEASONAL INDEX by calendar month — mean daily revenue
    * in each month-of-year divided by the overall mean daily revenue, the
    * classical ratio-to-moving-average seasonal table (index 1.10 = "this
    * month runs 10% hot") that planning reads next to q213's DOW profile
    * and q251's additive decomposition. ENTIRELY exact until two
    * divisions: per-month Σcents and day counts are exact BIGINTs; the
    * index is (sx_m/n_m)/(SX/N), a fixed four-division double tree
    * identical in both engines. One per-day aggregate, then a 12-row
    * frame with a broadcast one-row total.
    */
  def monthlySeasonalIndex(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = dailyCents(spark, sfDir)
    val tot = daily.agg(sum(col("x")).as("sx_all"), count(lit(1)).as("n_all"))
    daily.groupBy(month(col("day")).cast("long").as("month_of_year"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"))
      .crossJoin(broadcast(tot))
      .select(col("month_of_year"), col("n_days"),
        (col("sx").cast("double") / col("n_days").cast("double"))
          .as("mean_daily_cents"),
        ((col("sx").cast("double") / col("n_days").cast("double")) /
          (col("sx_all").cast("double") / col("n_all").cast("double")))
          .as("seasonal_index"))
  }

  /** SHIP-LAG DRIFT BY ORDER MONTH — mean and population σ of the days
    * between an order's placement and each line's ship date, per calendar
    * month of placement: the operational-latency drift monitor (a mean
    * that creeps or a σ that widens is a fulfillment regression long
    * before SLAs fire), the q303 machinery pointed at the ship pipeline.
    * Lags are EXACT integer days off the orderkey join (co-partitioned
    * fact⋈fact shuffle — the one corpus-sized exchange); Σlag and Σlag²
    * fold exactly (DECIMAL(38,0)/HUGEINT); μ and σ are one fixed tree per
    * month off n·Σl² − (Σl)².
    */
  def shipLagDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val lags = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey").as("l_orderkey"),
          to_date(col("o_orderdate")).as("odate")), "l_orderkey")
      .select(date_trunc("month", col("odate")).cast("date").as("month"),
        datediff(col("ship"), col("odate")).cast("long").as("lag"))
    val s = lags.groupBy(col("month"))
      .agg(count(lit(1)).as("n_lines"), sum(col("lag")).as("sl"),
        sum((col("lag").cast(DecimalType(38, 0)) * col("lag"))
          .cast(DecimalType(38, 0))).as("sll"))
    val nD = col("n_lines").cast("double")
    val mu = col("sl").cast("double") / nD
    val varNum = (col("n_lines").cast(DecimalType(38, 0)) * col("sll") -
      col("sl").cast(DecimalType(38, 0)) * col("sl").cast(DecimalType(38, 0)))
      .cast(DecimalType(38, 0))
    s.select(col("month"), col("n_lines"), mu.as("mean_lag_days"),
      (sqrt(Num.decToDouble(varNum)) / nD).as("sd_lag_days"))
  }

  /** SPLIT-CONFORMAL PREDICTION INTERVAL for the EWMA forecast (Vovk et
    * al.; Lei et al. 2018 — public): the calibration period's absolute
    * residuals yield q̂ = the ⌈(n+1)(1−α)⌉-th order statistic, and
    * forecast ± q̂ is a distribution-free interval whose empirical test
    * coverage the report states next to the 1−α target — the honest
    * uncertainty wrapper any forecast ships with. Exactness: residuals are
    * already-deterministic doubles; the order statistic is a rank
    * selection over the |days|-sized aggregated frame (no interpolation);
    * coverage is an exact count over exact comparisons. One summary row.
    */
  def conformalForecast(spark: SparkSession, sfDir: String,
      alpha: Double = 0.1, splitDate: String = "1999-01-01"): DataFrame = {
    val scored = dailyForecastErrors(spark, sfDir)
      .select(col("day"), abs(col("e")).as("ae"))
    val cut = lit(splitDate).cast("date")
    val cal = scored.filter(col("day") < cut)
    val nc = cal.agg(count(lit(1)).as("n_cal"))
    val k = least(ceil((col("n_cal") + 1).cast("double") * lit(1.0 - alpha))
      .cast("long"), col("n_cal"))
    val qhat = cal
      .withColumn("rn", row_number().over(Window.orderBy(col("ae"), col("day"))))
      .crossJoin(broadcast(nc))
      .filter(col("rn") === k)
      .select(col("n_cal"), col("ae").as("qhat_cents"))
    scored.filter(col("day") >= cut)
      .crossJoin(broadcast(qhat))
      .agg(first(col("n_cal")).as("n_cal"),
        count(lit(1)).as("n_test"),
        first(col("qhat_cents")).as("qhat_cents"),
        sum(when(col("ae") <= col("qhat_cents"), 1L).otherwise(0L)).as("n_covered"))
      .select(col("n_cal"), col("n_test"), col("qhat_cents"), col("n_covered"),
        (col("n_covered").cast("double") / col("n_test").cast("double")).as("coverage"),
        lit(1.0 - alpha).as("target"))
  }

  /** DAY-OF-WEEK SEASONAL INDEX of revenue: mean daily revenue per weekday
    * over the grand mean — the multiplicative seasonality profile behind
    * any weekly-decomposition forecast. The weekday is PURE DATE
    * ARITHMETIC (days since a fixed Monday, mod 7 — no locale-dependent
    * dayofweek whose week-start conventions differ between engines).
    * Integer cents throughout; the index is one fixed tree of exact-int
    * doubles. Scale: per-day aggregate, then 7 rows.
    */
  def dowSeasonality(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = dailyCents(spark, sfDir)
      .withColumn("dow", (datediff(col("day"), lit("1990-01-01").cast("date")) % 7).cast("long"))
    val tot = daily.agg(count(lit(1)).as("n_days_all"), sum(col("x")).as("s_all"))
    val perDow = daily.groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("total_cents"))
    val avgDow = col("total_cents").cast("double") / col("n_days").cast("double")
    val avgAll = col("s_all").cast("double") / col("n_days_all").cast("double")
    perDow.crossJoin(broadcast(tot))
      .select(col("dow"), col("n_days"), col("total_cents"),
        avgDow.as("avg_daily_cents"), (avgDow / avgAll).as("seasonal_index"))
  }
}
