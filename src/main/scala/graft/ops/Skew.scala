package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for the one join shape AQE cannot always save: a large
  * probe side whose key distribution is dominated by a few hot keys, joined to
  * a build side too big to broadcast. Hash-partitioning sends every hot-key row
  * to one task; salting fans each key out over `nSalts` sub-keys.
  *
  * Probe rows get a per-row salt (row identity, NOT the key — salting by key
  * would re-concentrate the hot key); build rows replicate once per salt value.
  * The join result is salt-invariant, so correctness is deterministic even
  * though salt assignment is not. Cost: build side shuffles nSalts× — worth it
  * exactly when the hot key's single-task time exceeds that. For aggregations
  * this is unnecessary (partial aggregation already combines map-side), and
  * small dims should broadcast instead; this covers the remaining case.
  */
object Skew {

  val SaltCol = "__graft_salt"

  /** Inner equi-join `probe.key = build.key`, salted `nSalts` ways. Column set
    * of the result = probe columns ++ build columns (as a plain inner join).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, nSalts: Int): DataFrame = {
    require(nSalts > 0)
    val saltedProbe = probe.withColumn(SaltCol, pmod(monotonically_increasing_id(), lit(nSalts)))
    val replicatedBuild = build.withColumn(SaltCol,
      explode(array((0 until nSalts).map(i => lit(i.toLong)): _*)))
    saltedProbe.join(replicatedBuild,
        saltedProbe(probeKey) === replicatedBuild(buildKey) &&
        saltedProbe(SaltCol) === replicatedBuild(SaltCol))
      .drop(SaltCol)
  }

  /** Join-key skew diagnosis — the measurement that decides between a plain
    * hash join, [[saltedJoin]], and AQE's skew splitting: per-key row counts
    * on the probe side, ranked, each with its multiple of the mean key load
    * (`skew_x`, an int/int-derived IEEE division — cross-engine exact). The
    * top-`k` report is what an operator would consult (or a planner rule
    * would threshold) before choosing a distribution strategy.
    *
    * Scale shape: one partial-combined hash aggregate on the key (the same
    * exchange the join itself would pay), a broadcast one-row mean, and a
    * global top-k — `TakeOrderedAndProject`, never a full sort.
    */
  def keySkewReport(df: DataFrame, key: String, k: Int = 20): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
    val mean = counts.agg(
      count(lit(1)).as("n_keys"), sum(col("n_rows")).as("n_total"))
    counts.crossJoin(broadcast(mean))
      // cast BEFORE the multiply: n_rows·n_keys as int64 wraps past ~9.2e18,
      // which a 1e10-row hot key × 1e9 keys reaches at the design point
      .withColumn("skew_x",
        col("n_rows").cast("double") * col("n_keys") / col("n_total"))
      .orderBy(col("n_rows").desc, col(key).asc)
      .limit(k)
      .select(col(key), col("n_rows"), col("n_keys"), col("n_total"), col("skew_x"))
  }
}
