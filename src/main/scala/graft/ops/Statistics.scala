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
}
