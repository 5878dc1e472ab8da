package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Re-identification-risk audits for release candidates — the privacy gate a
  * training-data pipeline runs BEFORE publishing a derived table, completing
  * the PII tier beside [[Corpus.piiRedact]]'s in-text scrubbing (Sweeney's
  * k-anonymity / Machanavajjhala's l-diversity, both public literature;
  * k-anonymity: every quasi-identifier combination must describe ≥ k rows,
  * l-diversity: each such group must carry ≥ l distinct sensitive values).
  *
  * Scale shape: each audit level is ONE map-side-combined groupBy over the
  * quasi-identifier key — counts and distinct-sensitive both partial-agg, so
  * the shuffle carries |QI-groups| rows, never the table. The generalization
  * step (nation → region) is a broadcast dim join BEFORE its groupBy:
  * coarsening at 100 TB is a re-aggregation, not a rescan of the detail
  * level, because the second level folds from the FIRST level's output (the
  * generalization lattice collapses monotonically).
  */
object Privacy {

  /** Two-level k-anonymity / l-diversity audit of the customer table.
    * Quasi-identifiers: (nation, mktsegment) at the detail level,
    * (region, mktsegment) after one generalization step; sensitive
    * attribute: the account-balance band (floor(acctbal/1000)). Output one
    * row per QI group and level: group size, distinct sensitive values, and
    * the k/l violation flags the release gate reads. The coarsened level is
    * computed FROM the detail counts (sums and distinct-over-bands
    * re-aggregate exactly because region partitions nations).
    */
  def kAnonymityAudit(spark: SparkSession, sfDir: String,
      k: Int = 5, l: Int = 2): DataFrame = {
    val nation = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val region = Tables.region(spark, sfDir)
      .select(col("r_regionkey"), col("r_name"))
    val detail = Tables.customer(spark, sfDir)
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name").as("nation"), col("r_name").as("region"),
        col("c_mktsegment").as("segment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("band"))
    // detail level: one partial-agged groupBy carrying (QI, band) pairs
    val byBand = detail
      .groupBy(col("region"), col("nation"), col("segment"), col("band"))
      .agg(count(lit(1)).as("n"))
    val nationLevel = byBand
      .groupBy(col("region"), col("nation"), col("segment"))
      .agg(sum(col("n")).as("n"), count(lit(1)).as("n_sensitive"))
    // generalized level folds from the BAND-level partials, not the table:
    // region ⊇ nation, so distinct bands re-aggregate exactly
    val regionLevel = byBand
      .groupBy(col("region"), col("segment"), col("band"))
      .agg(sum(col("n")).as("n"))
      .groupBy(col("region"), col("segment"))
      .agg(sum(col("n")).as("n"), count(lit(1)).as("n_sensitive"))
    nationLevel
      .select(lit("nation_segment").as("level"),
        concat_ws("|", col("nation"), col("segment")).as("qi_group"),
        col("n"), col("n_sensitive"))
      .unionByName(regionLevel
        .select(lit("region_segment").as("level"),
          concat_ws("|", col("region"), col("segment")).as("qi_group"),
          col("n"), col("n_sensitive")))
      .select(col("level"), col("qi_group"),
        col("n").cast("long").as("n"),
        col("n_sensitive").cast("long").as("n_sensitive"),
        (col("n") < k).as("violates_k"),
        (col("n_sensitive") < l).as("violates_l"))
  }
}
