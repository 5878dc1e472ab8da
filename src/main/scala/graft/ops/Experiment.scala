package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{Num, Tables}

/** Online-experimentation analytics over the event stream — the A/B readout
  * layer every growth team runs on top of an events table. Assignment is a
  * DETERMINISTIC hash split (md5 of user id + salt — the same leakage-safe
  * bucketing as [[Corpus.hashSplit]]), so arms are reproducible across
  * engines, runs and partitionings with no stored assignment table.
  */
object Experiment {

  /** Deterministic arm: 'A' for even md5-bucket parity, else 'B'. */
  private def arm(id: Column, salt: String): Column =
    when(conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long") % 2 === 0, "A").otherwise("B")

  /** TWO-PROPORTION A/B TEST on user conversion (did the user fire at
    * least `minPurchases` purchase events — every user fires SOME purchase
    * in this synthetic stream, so the interesting binary is heavy
    * purchasing): per-arm user counts and conversions, the pooled
    * two-proportion z statistic, and the Wald 95% CI on the rate
    * difference — the standard experiment readout. EXACT until the final
    * trees: conversions are integer aggregates over one events scan
    * (map-side combined per user first, so a chatty user can't double
    * count), and z / CI are single fixed correctly-rounded trees over
    * exact-long rates with the 1.96 critical value pinned. Scale shape:
    * one per-user aggregate, one 2-row arm aggregate, driver-free.
    */
  def abTest(spark: SparkSession, sfDir: String, salt: String = "exp1",
      minPurchases: Int = 14): DataFrame = {
    val counts = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purch"))
    abReadout(counts, salt, minPurchases)
  }

  /** The A/B readout over a (user_id, n_purch) frame — shared verbatim by
    * the batch test above and the STREAMING experiment monitor
    * ([[graft.streaming.EventStream.abMonitorAvailableNow]]), which drains
    * the same per-user counts out of a stateful streaming aggregate; both
    * producers gate against the SAME oracle SQL, proving batch/stream
    * parity of the whole readout, not just the counts.
    */
  private[graft] def abReadout(userCounts: DataFrame, salt: String = "exp1",
      minPurchases: Int = 14): DataFrame = {
    val users = userCounts
      .select(col("user_id"),
        when(col("n_purch") >= minPurchases, 1L).otherwise(0L).as("converted"))
      .withColumn("arm", arm(col("user_id"), salt))
    val arms = users.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("x"))
    val a = arms.filter(col("arm") === "A")
      .select(col("n").as("n_a"), col("x").as("x_a"))
    val b = arms.filter(col("arm") === "B")
      .select(col("n").as("n_b"), col("x").as("x_b"))
    val wide = a.crossJoin(b)
    def d(c: Column): Column = c.cast("double")
    val ra = d(col("x_a")) / d(col("n_a"))
    val rb = d(col("x_b")) / d(col("n_b"))
    val pPool = d(col("x_a") + col("x_b")) / d(col("n_a") + col("n_b"))
    val se = sqrt(pPool * (lit(1.0) - pPool) *
      (lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b"))))
    val seDiff = sqrt(ra * (lit(1.0) - ra) / d(col("n_a")) +
      rb * (lit(1.0) - rb) / d(col("n_b")))
    val z = (ra - rb) / se
    wide.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      ra.as("rate_a"), rb.as("rate_b"), (ra - rb).as("diff"),
      z.as("z"),
      (ra - rb - lit(1.96) * seDiff).as("ci_lo"),
      (ra - rb + lit(1.96) * seDiff).as("ci_hi"),
      (abs(z) > lit(1.96)).as("significant"))
  }

  /** CUPED VARIANCE REDUCTION (Deng et al. 2013, public): adjust each
    * user's experiment-period spend by their PRE-period spend — Y′ = Y −
    * θ·(X − X̄), θ = cov(X,Y)/var(X) — then report per-arm means of both
    * the raw and adjusted metric plus the variance-reduction ratio the
    * technique exists for. Periods split the event window in half by a
    * fixed date; spends fold as exact cents. θ comes from the q143
    * decimal-exact moment recipe (n-scaled covariance/variance, one
    * bridged division); adjusted values are then identical doubles, and
    * per-arm means/variances fold 12-decimal-quantized terms exactly.
    * Scale: one per-user two-period aggregate, a one-row broadcast for
    * (θ, X̄), a 2-row arm rollup.
    */
  def cuped(spark: SparkSession, sfDir: String, salt: String = "exp1",
      splitDate: String = "2024-01-16"): DataFrame = {
    val cents = (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
    val users = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("ts") < lit(splitDate).cast("timestamp_ntz"), cents)
          .otherwise(0L)).as("x"),
        sum(when(col("ts") >= lit(splitDate).cast("timestamp_ntz"), cents)
          .otherwise(0L)).as("y"))
      .withColumn("arm", arm(col("user_id"), salt))
    val mom = users.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum((col("x").cast(DecimalType(38, 0)) * col("x")).cast(DecimalType(38, 0))).as("sxx"),
      sum((col("x").cast(DecimalType(38, 0)) * col("y")).cast(DecimalType(38, 0))).as("sxy"))
    // θ = (n·Σxy − Σx·Σy) / (n·Σxx − Σx·Σx): exact decimals, one division
    val covN = (col("n") * col("sxy") - col("sx").cast(DecimalType(38, 0)) * col("sy"))
      .cast(DecimalType(38, 0))
    val varN = (col("n") * col("sxx") - col("sx").cast(DecimalType(38, 0)) * col("sx"))
      .cast(DecimalType(38, 0))
    val stats = mom.select(col("n"), col("sx"),
      (Num.decToDouble(covN) / Num.decToDouble(varN)).as("theta"),
      (col("sx").cast("double") / col("n").cast("double")).as("xbar"))
    def q12(c: Column): Column = c.cast("string").cast(DecimalType(28, 12))
    val adj = users.crossJoin(broadcast(stats))
      .withColumn("yd", col("y").cast("double"))
      .withColumn("yadj", col("yd") -
        col("theta") * (col("x").cast("double") - col("xbar")))
    val armAgg = adj.groupBy(col("arm"))
      .agg(count(lit(1)).as("nu"),
        Num.decToDouble(sum(q12(col("yd")))).as("sy"),
        Num.decToDouble(sum(q12(col("yd") * col("yd")))).as("syy"),
        Num.decToDouble(sum(q12(col("yadj")))).as("sa"),
        Num.decToDouble(sum(q12(col("yadj") * col("yadj")))).as("saa"),
        first(col("theta")).as("theta"))
    val nD = col("nu").cast("double")
    val my = col("sy") / nD
    val ma = col("sa") / nD
    val vy = col("syy") / nD - my * my
    val va = col("saa") / nD - ma * ma
    armAgg.select(col("arm"), col("nu").as("n_users"),
      my.as("mean_y"), ma.as("mean_y_adj"), col("theta"),
      vy.as("var_y"), va.as("var_y_adj"), (va / vy).as("var_ratio"))
  }
}
