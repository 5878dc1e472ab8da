package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark lacks as built-ins — as-of and range joins — composed
  * from existing operators (extension ladder tier (a), SURVEY §7.3): no custom
  * plan nodes needed, and the compositions have the scale behavior a native
  * implementation would want.
  */
object Joins {

  /** As-of join: for each left row, the LATEST right row with the same key and
    * time STRICTLY BEFORE the left row's time (the "most recent prior state"
    * lookup — quotes-before-trade, last-login-before-purchase…).
    *
    * Shape: union both sides, one window over (key, time) carrying the right
    * payload forward — a single shuffle on the key, merge-like within
    * partitions, never a per-row subquery or a time-theta join (which would be
    * O(n·m) per key). The right side must be unique per (key, time); callers
    * aggregate first (see the q47 usage), because "latest of several equal
    * times" is not a deterministic contract any engine can hash-check.
    *
    * `payload` columns are returned as `asof_<name>`, null when no prior right
    * row exists. The payload travels as ONE struct per right row, so the
    * result is row-atomic — all `asof_*` values come from the same (latest
    * prior) right row, including that row's own nulls; per-column carries
    * would stitch together values from different right rows.
    *
    * Null times: right rows with a null time are dropped (they are "before"
    * nothing), left rows with a null time get null payloads (they have no
    * defined prior) — pinned on both engines via NULLS FIRST ordering.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {

    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payload.map(col): _*)
    val rStructType = right.select(payloadStruct).schema.head.dataType
    val lSide = left
      .withColumn("__is_l", lit(1))
      .withColumn("__asof", lit(null).cast(rStructType))
    val rSide = leftCols.foldLeft(
      right.filter(col(rightTime).isNotNull)
        .select(col(rightKey).as(leftKey), col(rightTime).as(leftTime),
          lit(0).as("__is_l"), payloadStruct.as("__asof"))) { (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }

    // at equal times, left rows sort FIRST (is_l desc) so they cannot see a
    // same-instant right row — that is what makes the join strict
    val w = Window.partitionBy(col(leftKey))
      .orderBy(col(leftTime).asc_nulls_first, col("__is_l").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("__asof", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__is_l") === 1)
      .select((leftCols.map(col) ++
        payload.map(c => col("__asof").getField(c).as(s"asof_$c"))): _*)
  }

  /** q47 driver: each event matched to the same user's most recent PRIOR
    * click (the classic attribution lookup). The right side pre-aggregates to
    * one click per (user, instant) so the as-of contract is deterministic.
    */
  def eventPrevClick(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    val ev = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
    asofJoin(ev, clicks, "user_id", "user_id", "ts", "ts", Seq("click_id"))
  }

  /** q48 driver: parts classified into retail-price bands via the banded
    * range join (bucket width deliberately ≠ band width to exercise interval
    * explosion).
    */
  def partPriceBands(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      (0, 900.0, 905.0), (1, 905.0, 910.0), (2, 910.0, 915.0), (3, 915.0, 920.0))
      .toDF("band_id", "lo", "hi")
    bandedRangeJoin(
      graft.core.Tables.part(spark, sfDir).select(col("p_partkey"), col("p_retailprice")),
      "p_retailprice", bands, "lo", "hi", bucket = 2.5)
      .select(col("p_partkey"), col("p_retailprice"), col("band_id"), col("lo"), col("hi"))
  }

  /** Banded range join: left rows matched to right intervals
    * `[lo, hi)` containing `valueCol`. Equi-join on bucket indices of width
    * `bucket` (intervals explode to every bucket they touch), exact residual
    * after — candidate pairs are bounded by interval-width/bucket instead of
    * |left|×|right| the theta join would enumerate. Over-covered edge buckets
    * are harmless: the residual predicate is exact, so bucketing only affects
    * candidate volume, never the result.
    */
  def bandedRangeJoin(left: DataFrame, valueCol: String,
      right: DataFrame, loCol: String, hiCol: String,
      bucket: Double): DataFrame = {
    val lb = left.withColumn("__bucket", floor(col(valueCol) / bucket).cast("long"))
    val rb = right.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucket).cast("long"),
        floor(col(hiCol) / bucket).cast("long"))))
    lb.join(rb, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }
}
