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

  /** The distribution-strategy POLICY — the decision [[keySkewReport]] exists
    * to feed, closing the measure→choose→execute loop. Pure function of the
    * measured statistics so the choice is deterministic and spec-pinnable:
    *
    *  1. build side fits the broadcast budget → `broadcast`: no probe
    *     shuffle at all, hot keys are irrelevant.
    *  2. hottest key under `skewThreshold`× the mean key load → `plain`:
    *     the skew a hash join already tolerates.
    *  3. skewed, AQE available → `aqe_skew`: a sort-merge join AQE splits at
    *     runtime from MEASURED partition sizes — preferred over salting
    *     because only the actually-oversized partitions pay fan-out.
    *  4. skewed, no AQE → `salted`: static fan-out, the only remaining lever.
    *
    * Thresholds are explicit parameters (row-count proxy for the broadcast
    * budget; at 100 TB feed it byte statistics instead) so the policy is
    * auditable — the q102 oracle recomputes the same CASE from the same
    * per-key counts in SQL.
    */
  def chooseStrategy(maxSkewX: Double, buildRows: Long, broadcastRowLimit: Long,
      skewThreshold: Double, aqeEnabled: Boolean): String =
    if (buildRows <= broadcastRowLimit) "broadcast"
    else if (maxSkewX < skewThreshold) "plain"
    else if (aqeEnabled) "aqe_skew"
    else "salted"

  /** Measure → choose → execute: diagnoses the probe key with
    * [[keySkewReport]], picks a strategy with [[chooseStrategy]], and returns
    * (decision, inner-join result). The join RESULT is strategy-invariant —
    * every branch produces the same rows (SkewSpec pins this) — so the policy
    * only moves cost, never semantics.
    *
    * The two measurement jobs (build count + top-key skew) run at planning
    * time by design: this is a tiny planner, and at scale both numbers come
    * from table statistics instead of scans. The skew probe pays one
    * partial-combined aggregate on the key — the same exchange the join
    * itself would pay — and collects a single row.
    */
  def adaptiveJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, broadcastRowLimit: Long = 1000000,
      skewThreshold: Double = 3.0, nSalts: Int = 8): (String, DataFrame) = {
    val spark = probe.sparkSession
    val buildRows = build.count()
    val top = keySkewReport(probe, probeKey, 1).select(col("skew_x")).collect()
    val maxSkewX = if (top.isEmpty) 0.0 else top.head.getDouble(0)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true").toBoolean &&
      spark.conf.get("spark.sql.adaptive.skewJoin.enabled", "true").toBoolean
    val decision = chooseStrategy(maxSkewX, buildRows, broadcastRowLimit,
      skewThreshold, aqe)
    val joined = decision match {
      case "broadcast" => probe.join(broadcast(build), probe(probeKey) === build(buildKey))
      case "plain"     => probe.join(build, probe(probeKey) === build(buildKey))
      // the merge hint pins a sort-merge join — the shape AQE's
      // OptimizeSkewedJoin splits from measured partition sizes
      case "aqe_skew"  => probe.join(build.hint("merge"), probe(probeKey) === build(buildKey))
      case _           => saltedJoin(probe, build, probeKey, buildKey, nSalts)
    }
    (decision, joined)
  }

  /** The oracle-gated instantiation (q102): lineitem ⋈ orders through the
    * full measure→choose→execute loop, rolled up per order priority with the
    * chosen strategy as a column — so the DECISION itself is oracle-checked
    * (the DuckDB twin recomputes the same CASE from the same per-key counts),
    * not just the strategy-invariant join result. The 10k-row broadcast limit
    * makes the choice scale-sensitive on purpose: sf0.001's orders side
    * broadcasts, sf0.01+ falls through to the skew test.
    */
  def adaptiveJoinDemo(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    val probe = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
    val build = graft.core.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val (decision, joined) = adaptiveJoin(probe, build, "l_orderkey", "o_orderkey",
      broadcastRowLimit = 10000)
    joined.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_qty"))
      .withColumn("strategy", lit(decision))
  }

  /** Salted TWO-PHASE aggregation (q160): an explicit pre-aggregate keyed by
    * (key, salt) fans a hot key across `salts` reducers, then a tiny final
    * aggregate over salts·|keys| partial rows re-merges — the classic
    * hot-key-aggregation decomposition, made possible by carrying only
    * ASSOCIATIVE partials (count, exact decimal sum) between the phases.
    * The oracle is the PLAIN single-phase GROUP BY: the whole point is that
    * the decomposition is invisible in the result, which only holds because
    * the decimal partials merge order-independently (double partials would
    * hash-mismatch). Spark's own partial aggregation does this implicitly
    * per-partition; the explicit salt matters when one key dominates a
    * partition's output so badly that the FINAL aggregate's single reducer
    * for that key becomes the straggler.
    */
  def saltedEventAgg(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      salts: Int = 16): DataFrame = {
    val partial = graft.core.Tables.events(spark, sfDir)
      .withColumn("salt", pmod(col("event_id"), lit(salts)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))).as("pv"))
    partial.groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n_events"),
        sum(col("pv")).cast("double").as("total_value"))
  }
}
