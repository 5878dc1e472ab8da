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
