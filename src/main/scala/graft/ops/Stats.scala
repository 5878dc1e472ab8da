package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Table statistics collection — the `ANALYZE TABLE` side of an engine:
  * row counts, null counts, exact distinct counts and min/max per column,
  * the numbers a cost-based optimizer (and a data-quality gate) feeds on.
  * The reference has no stats tier; Spark's own CBO consumes exactly these
  * via the catalog, so the operator doubles as the manual path to them.
  *
  * Shape: one UNION branch per column, each a two-level aggregate over a
  * scan PRUNED to that single column — `groupBy(value)` with map-side
  * partial distinct, then nulls/NDV/min/max off the tiny distinct table.
  * N exact distincts in ONE wide agg would instead go through Spark's
  * Expand (row count × N before the exchange — measured 19.2 s vs 1.9 s at
  * sf0.1 for 11 columns); per-column branches keep every exchange
  * |distinct values|-sized and each scan one-column wide. Exact NDV is the
  * gateable choice; `approx_count_distinct` (q61's HLL) is the documented
  * one-pass-over-all-columns sketch swap at 100 TB.
  *
  * Min/max surface typed: numerics as doubles (IEEE-representable exactly
  * for TPC-H money/ints), strings as-is, timestamps as epoch micros —
  * avoiding engine-specific string formatting of doubles/timestamps, which
  * is NOT portable across engines.
  */
object Stats {

  def tableStats(spark: SparkSession, sfDir: String): DataFrame = {
    val df = Tables.lineitem(spark, sfDir)

    def branch(f: StructField): DataFrame = {
      val c = col(f.name)
      // two-level: distinct-value table first (map-side partial), stats off it.
      // count(c) skips the null group, so ndv matches count_distinct exactly.
      val g = df.select(c).groupBy(c).agg(count(lit(1)).as("cnt"))
      val (minNum, maxNum) = f.dataType match {
        case _: NumericType => (min(c).cast("double"), max(c).cast("double"))
        case _: TimestampNTZType | _: TimestampType =>
          (min(unix_micros(c.cast("timestamp"))).cast("double"),
            max(unix_micros(c.cast("timestamp"))).cast("double"))
        case _ => (lit(null).cast("double"), lit(null).cast("double"))
      }
      val (minStr, maxStr) = f.dataType match {
        case StringType => (min(c), max(c))
        case _ => (lit(null).cast("string"), lit(null).cast("string"))
      }
      g.agg(
        sum(col("cnt")).as("n_rows"),
        sum(when(c.isNull, col("cnt")).otherwise(0L)).as("n_nulls"),
        count(c).as("ndv"),
        minNum.as("min_num"), maxNum.as("max_num"),
        minStr.as("min_str"), maxStr.as("max_str"))
        .select(lit(f.name).as("column_name"), col("n_rows"), col("n_nulls"),
          col("ndv"), col("min_num"), col("max_num"), col("min_str"), col("max_str"))
    }

    df.schema.fields.toSeq.map(branch).reduce(_ unionByName _)
  }

  /** Incremental ANALYZE — the q98 snapshot+delta contract applied to stats:
    * per-slice MERGEABLE partials (counts sum, mins min, maxes max) combined
    * into table-level stats that must be BIT-IDENTICAL to a from-scratch
    * pass, while only ever scanning each slice once. NDV is deliberately
    * absent: exact distinct counts don't merge (the mergeable swap is q61's
    * HLL sketch — union of sketches IS the sketch of the union); everything
    * surfaced here merges exactly.
    *
    * The oracle recomputes from scratch over the full table, so the gate
    * proves merge ≡ recompute.
    */
  def incrementalTableStats(spark: SparkSession, sfDir: String): DataFrame = {
    val full = Tables.lineitem(spark, sfDir)
    val cut = lit("1999-01-01").cast("timestamp_ntz")
    val slices = Seq(
      full.filter(col("l_shipdate") < cut),   // the standing snapshot
      full.filter(col("l_shipdate") >= cut))  // the newly arrived delta

    def partials(df: DataFrame): DataFrame =
      df.schema.fields.toSeq.map { f =>
        val c = col(f.name)
        val (minNum, maxNum) = f.dataType match {
          case _: NumericType => (min(c).cast("double"), max(c).cast("double"))
          case _: TimestampNTZType | _: TimestampType =>
            (min(unix_micros(c.cast("timestamp"))).cast("double"),
              max(unix_micros(c.cast("timestamp"))).cast("double"))
          case _ => (lit(null).cast("double"), lit(null).cast("double"))
        }
        val (minStr, maxStr) = f.dataType match {
          case StringType => (min(c), max(c))
          case _ => (lit(null).cast("string"), lit(null).cast("string"))
        }
        df.agg(
          count(lit(1)).as("n_rows"),
          sum(when(c.isNull, 1L).otherwise(0L)).as("n_nulls"),
          minNum.as("min_num"), maxNum.as("max_num"),
          minStr.as("min_str"), maxStr.as("max_str"))
          .select(lit(f.name).as("column_name"), col("n_rows"), col("n_nulls"),
            col("min_num"), col("max_num"), col("min_str"), col("max_str"))
      }.reduce(_ unionByName _)

    slices.map(partials).reduce(_ unionByName _)
      .groupBy(col("column_name"))
      .agg(
        sum(col("n_rows")).as("n_rows"),
        sum(col("n_nulls")).as("n_nulls"),
        min(col("min_num")).as("min_num"), max(col("max_num")).as("max_num"),
        min(col("min_str")).as("min_str"), max(col("max_str")).as("max_str"))
  }

  /** The documented mergeable-NDV swap ([[incrementalTableStats]] omits NDV
    * because exact distinct counts don't merge): per-slice DataSketches HLL
    * sketches (`hll_sketch_agg`) merged with `hll_union_agg` — union of
    * sketches IS the sketch of the union, so NDV joins the incremental
    * stats frame without ever rescanning the snapshot.
    *
    * Shape per slice: ONE scan, ONE wide aggregate (row count + per-column
    * null count + per-column HLL sketch, all partial-mergeable map-side) —
    * no Expand, no per-column branch, the one-pass-over-all-columns shape
    * [[tableStats]]'s Scaladoc names for 100 TB. The merge is a one-row agg
    * over `|slices|` rows; the final unpivot is `inline` over an N-element
    * literal array, constant-sized.
    *
    * Values are cast to string first: `hll_sketch_agg` accepts int/long/
    * string/binary only, and one input domain keeps every column's sketch
    * comparable to its exact twin (`count(distinct cast(c as string))`).
    *
    * Merge-exactness nuance, pinned by StatsSketchSpec: the merged HLL
    * REGISTER state is a pure per-bucket max over the hashed item set (max
    * is associative), so the estimate is invariant to HOW the table was
    * sliced — 2 slices and 4 slices merge to the identical number. It is
    * NOT bit-equal to a never-merged single sketch, which reports the
    * order-dependent HIP estimator that a multi-input union deliberately
    * discards; both sit inside the same published error bound. Sketch
    * estimates are engine-specific, so like q61/q71 this is rows-only at
    * the driver gate; the spec pins (a) slice-invariance and (b) the
    * 3-sigma HLL error bound vs exact NDV.
    */
  def approxTableStats(spark: SparkSession, sfDir: String, lgK: Int = 12,
      cuts: Seq[String] = Seq("1999-01-01")): DataFrame = {
    val full = Tables.lineitem(spark, sfDir)
    val bounds = (None +: cuts.sorted.map(Option(_))) :+ None
    val slices = bounds.sliding(2).map {
      case Seq(lo, hi) =>
        val c = col("l_shipdate")
        Seq(lo.map(d => c >= lit(d).cast("timestamp_ntz")),
            hi.map(d => c < lit(d).cast("timestamp_ntz")))
          .flatten.reduceOption(_ && _)
          .map(full.filter).getOrElse(full)
    }.toSeq
    approxStatsOverSlices(slices, lgK)
  }

  private def approxStatsOverSlices(slices: Seq[DataFrame], lgK: Int): DataFrame = {
    val names = slices.head.schema.fields.map(_.name).toSeq

    def partials(df: DataFrame): DataFrame = {
      val aggs = count(lit(1)).as("n_rows") +:
        names.flatMap { n =>
          Seq(
            sum(when(col(n).isNull, 1L).otherwise(0L)).as(s"nn_$n"),
            hll_sketch_agg(col(n).cast("string"), lit(lgK)).as(s"sk_$n"))
        }
      df.agg(aggs.head, aggs.tail: _*)
    }

    val mergeAggs = sum(col("n_rows")).as("n_rows") +:
      names.flatMap { n =>
        Seq(
          sum(col(s"nn_$n")).as(s"nn_$n"),
          // second arg is allowDifferentLgConfigK — every slice sketches at
          // the same lgK, so differing configs are a bug, not a merge case
          hll_union_agg(col(s"sk_$n"), lit(false)).as(s"sk_$n"))
      }
    val merged = slices.map(partials).reduce(_ unionByName _)
      .agg(mergeAggs.head, mergeAggs.tail: _*)

    // constant-sized unpivot: one struct per column off the single merged row
    val entries = names.map { n =>
      struct(
        lit(n).as("column_name"),
        col("n_rows"),
        col(s"nn_$n").as("n_nulls"),
        hll_sketch_estimate(col(s"sk_$n")).as("ndv_approx"))
    }
    merged.select(inline(array(entries: _*)))
  }

  /** Per-DIMENSION feature profile of the embedding corpus: count, exact
    * sum/mean, min, max for every vector coordinate — the normalization
    * statistics a feature store publishes before z-scoring (the scaler's
    * fit step; apply is then a broadcast of |dims| rows). One posexplode →
    * one partial-aggregated groupBy(dim) — |dims| groups, no skew by
    * construction (every vector contributes to every dim exactly once).
    * Determinism: float→double widening is exact on both engines; the sum
    * crosses the decimal domain (Spark's tie-free double→decimal cast ≡
    * DuckDB's VARCHAR-bridged one — FP trap #2, see Num scaladoc) and
    * comes back through the string bridge; the mean is one further IEEE
    * division.
    */
  def embeddingDimStats(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.embeddings(spark, sfDir)
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"), col("x").cast("double").as("x"))
    d.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        graft.core.Num.decToDouble(sum(col("x").cast(DecimalType(28, 10)))).as("sum_x"),
        min(col("x")).as("min_x"),
        max(col("x")).as("max_x"))
      .withColumn("mean_x", col("sum_x") / col("n"))
  }

  /** The APPLY half of the scaler [[embeddingDimStats]] fits: min-max
    * normalize every embedding element with its dimension's (min, max) and
    * report the transformed per-dim profile — n, mean of the scaled values
    * (a bridged-decimal fold of correctly-rounded (x−min)/(max−min)
    * divisions), and the scaled min/max, which the spec pins at exactly
    * 0 and 1 (the transform's fixed points — a drifted stats table would
    * break this first). Fit→transform as ONE composition: the |dims|-row
    * stats frame broadcasts onto the posexploded elements, so the apply is
    * a scan-speed map at any corpus size; constant dims (max = min) pass
    * through as NULL scaled values rather than a divide-by-zero.
    */
  def scaledDimProfile(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.embeddings(spark, sfDir)
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"), col("x").cast("double").as("x"))
    val stats = embeddingDimStats(spark, sfDir)
      .select(col("dim"), col("min_x"), col("max_x"))
    val scaled = when(col("max_x") > col("min_x"),
      (col("x") - col("min_x")) / (col("max_x") - col("min_x")))
    d.join(broadcast(stats), "dim")
      .withColumn("s", scaled)
      .groupBy(col("dim"))
      .agg(count(col("s")).as("n"),
        graft.core.Num.decToDouble(sum(col("s").cast(DecimalType(28, 14))))
          .as("sum_scaled"),
        min(col("s")).as("min_scaled"),
        max(col("s")).as("max_scaled"))
      .withColumn("mean_scaled", col("sum_scaled") / col("n"))
  }
}
