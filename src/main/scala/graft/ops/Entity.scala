package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Entity resolution — blocked fuzzy matching of names into canonical
  * entities, the master-data half of deduplication (the reference's dim
  * tables assume clean keys; real feeds carry misspelled variants).
  *
  * Production ER shape, built for 100 TB:
  *  1. resolve DISTINCT names, not rows — names dedupe massively, so the
  *     quadratic fuzzy stage runs on a value table orders of magnitude
  *     smaller than the fact table;
  *  2. block before comparing — candidate pairs come from an equi-join on a
  *     blocking key (first name token here; multi-pass blocking on more keys
  *     raises recall at one extra equi-join each), never an all-pairs cross;
  *  3. edit-distance edges → connected components ([[Graph.connectedComponents]],
  *     the same O(log n)-round star rewiring the document chain uses — min
  *     label is lexicographic on strings, so the component label IS the
  *     canonical name);
  *  4. map rows to entities with one broadcast join of the label table —
  *     sized |distinct names|, orders of magnitude under the row count; if a
  *     corpus's distinct-name table outgrows the broadcast threshold, drop
  *     the hint and the same plan degrades gracefully to a shuffle join on
  *     p_name.
  */
object Entity {

  /** Canonical entity per part: parts whose names are within `maxDist` edits
    * (same first token) collapse to one entity named by the lexicographically
    * smallest member. Output: (p_partkey, p_name, entity_name, is_canonical).
    *
    * `broadcastLabels = false` is the oversized-label-table escape hatch
    * (doc point 4): the identical plan minus the hint, degrading to a
    * shuffle join on p_name — EntitySpec pins result equality and the
    * SortMergeJoin physical shape.
    */
  def partEntities(spark: SparkSession, sfDir: String, maxDist: Int = 3,
      broadcastLabels: Boolean = true): DataFrame =
    resolve(spark, sfDir, maxDist,
      Seq(n => split(n, " ").getItem(0)), broadcastLabels)

  /** Multi-pass blocking: one candidate-generation pass per blocking key
    * (first token AND last token here), edges unioned before the single
    * clustering. This is the standard recall lever — a variant that
    * mutates one blocking key still pairs under another — at the cost of one
    * extra equi-join per pass; the quadratic comparator still only ever runs
    * within blocks.
    */
  def partEntitiesMultiPass(spark: SparkSession, sfDir: String, maxDist: Int = 3): DataFrame =
    resolve(spark, sfDir, maxDist,
      Seq(n => split(n, " ").getItem(0),
        n => element_at(split(n, " "), -1)))

  private def resolve(spark: SparkSession, sfDir: String, maxDist: Int,
      blockers: Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column],
      broadcastLabels: Boolean = true): DataFrame = {
    val parts = Tables.part(spark, sfDir).select(col("p_partkey"), col("p_name"))
    val distinctNames = parts.select(col("p_name")).distinct()

    // bounded levenshtein: the 3-arg form runs the banded O(k·n) DP and
    // returns -1 past the threshold — at ER scale the comparator cost is
    // k·n per candidate pair, not n²
    val edges = blockers.map { blocker =>
      val names = distinctNames.withColumn("blk", blocker(col("p_name")))
      names.as("a").join(names.as("b"),
          col("a.blk") === col("b.blk") &&
            col("a.p_name") < col("b.p_name") &&
            levenshtein(col("a.p_name"), col("b.p_name"), maxDist) >= 0)
        .select(col("a.p_name").as("src"), col("b.p_name").as("dst"))
    }.reduce(_ union _).distinct()

    val labels = Graph.connectedComponents(
      distinctNames.select(col("p_name").as("id")), edges)

    val labelTable = labels.select(col("id").as("p_name"),
      col("component").as("entity_name"))
    parts
      .join(if (broadcastLabels) broadcast(labelTable) else labelTable, "p_name")
      .withColumn("is_canonical", col("p_name") === col("entity_name"))
      .select(col("p_partkey"), col("p_name"), col("entity_name"),
        col("is_canonical"))
  }
}
