package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Incremental maintenance of a JOIN materialized view — the delta-join
  * identity that turns "refresh the view" from a full recompute into
  * delta-bounded work:
  *
  *   (O ∪ ΔO) ⋈ (C ∪ ΔC)  =  O⋈C  ∪  ΔO⋈C  ∪  O⋈ΔC  ∪  ΔO⋈ΔC
  *
  * The first term is the standing view (already materialized); a refresh
  * computes only the three delta terms — each join carries a delta on at
  * least one side, so its cost scales with |Δ|, not |table|. q98 proved
  * merge ≡ recompute for a single-table aggregate; this extends the
  * contract through a JOIN, the shape every star-schema mart refresh needs
  * (new facts × standing dims, standing facts × late dims, new × new).
  *
  * Aggregation rides on top via mergeable partials (the q98 mechanics):
  * each term pre-aggregates to (key, decimal-sum, count) partials and the
  * final merge re-aggregates partials — sums of sums in the exact decimal
  * domain, so the merged view is BIT-IDENTICAL to from-scratch (the oracle
  * recomputes from scratch; the gate proves the identity).
  *
  * Scale shape: the fact deltas join a broadcast-sized dim slice (or
  * co-partitioned at scale); every partial-agg output is |keys|-sized.
  * Nothing rescans the standing fact table except the one term it genuinely
  * appears in (O⋈ΔC — bounded by |ΔC| after the join, and at 100 TB served
  * by a partition-pruned read of only the partitions containing the late
  * dim's keys; the oracle-checked identity is unchanged).
  */
object ViewMaintenance {

  /** Per-customer order stats maintained incrementally across BOTH a fact
    * delta (orders on/after the date cut) and a dimension delta (customers
    * with c_custkey ≡ 0 mod 4, a late-arriving dim slice).
    */
  def incrementalJoinView(spark: SparkSession, sfDir: String,
      cut: String = "1997-01-01"): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)

    val cutTs = lit(cut).cast("timestamp_ntz")
    val oOld = orders.filter(col("o_orderdate") < cutTs)
    val oNew = orders.filter(col("o_orderdate") >= cutTs)
    val cOld = customer.filter(pmod(col("c_custkey"), lit(4)) =!= 0)
    val cNew = customer.filter(pmod(col("c_custkey"), lit(4)) === 0)

    def term(o: DataFrame, c: DataFrame): DataFrame =
      o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .agg(
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev_part"),
          count(lit(1)).as("n_part"))

    val standingView = term(oOld, cOld)       // materialized once, reused
    val deltaTerms = Seq(term(oNew, cOld), term(oOld, cNew), term(oNew, cNew))

    (standingView +: deltaTerms).reduce(_ unionByName _)
      .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .agg(
        sum(col("rev_part")).cast("double").as("revenue"),
        sum(col("n_part")).as("n_orders"))
  }

  /** The from-scratch twin, for the spec's merge ≡ recompute cross-check
    * (the oracle proves the same identity cross-engine).
    */
  private[graft] def fromScratchJoinView(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .agg(
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
}
