package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** MERGE INTO semantics (the Delta-lake-style three-clause merge) as a pure
  * DataFrame transform — the reference's pipeline has only blind
  * insert-append (`/root/reference/src/load/write.py`); this is the upsert
  * surface a warehouse user actually reaches for, subsuming the SCD1
  * [[Relational.upsertLatest]] shape with conditional update/delete/insert:
  *
  * {{{
  * MERGE INTO target t USING source s ON t.k = s.k
  *   WHEN MATCHED AND <deleteWhen>  THEN DELETE
  *   WHEN MATCHED AND <updateWhen>  THEN UPDATE SET <updateSet>
  *   WHEN NOT MATCHED AND <insertWhen> THEN INSERT <insertValues>
  * }}}
  *
  * Clause order is FIXED delete-before-update (documented contract; pass
  * disjoint conditions if order must not matter). Conditions and set
  * expressions reference the two sides as `t.<col>` / `s.<col>`.
  *
  * Cardinality contract (same as Delta): a target row matched by MORE THAN
  * ONE source row is ambiguous — which update wins? — and the merge throws at
  * execution time rather than pick silently. A target with duplicate keys is
  * fine (one source row may update several target rows, as in Delta). The
  * guard is IN the plan: the per-key source match count is computed on the
  * SOURCE side (a window over the source's own keys, computed before the
  * join), then a conditional `raise_error` rides the output columns. Lazy,
  * distributed, and exchange-free beyond the join's own: the source must be
  * hash-partitioned by key for the join anyway, so the source-side window
  * reuses that partitioning, and not-matched rows never enter a window
  * (no NULL-key hotspot partition). Both [[mergeInto]] and
  * [[mergeDeletionVector]] carry the identical guard, so ambiguous sources
  * fail identically in both forms.
  *
  * Scale shape: ONE shuffle per side (the full-outer equi-join on the key;
  * the source-side window shares the source's exchange) + a per-row
  * projection. Nothing driver-side, no second pass over the target. For the
  * physical-rewrite-avoidance story see [[mergeDeletionVector]].
  */
object Merge {

  private val InT = "__graft_in_t"
  private val InS = "__graft_in_s"
  private val NMatches = "__graft_n_matches"

  /** The annotated join both public forms project from: target FULL OUTER
    * source on `keys`, with presence flags. Each SOURCE row carries the count
    * of source rows sharing its key (window over the source's own keys,
    * computed pre-join so the join's hash partitioning is reused and no
    * not-matched row lands in a NULL-key window partition) — after the join,
    * a matched target row's `NMatches` is exactly the number of source rows
    * that matched IT, regardless of duplicate keys on the target side.
    */
  private def joined(target: DataFrame, source: DataFrame,
      keys: Seq[String]): DataFrame = {
    val bySourceKey = Window.partitionBy(keys.map(col): _*)
    val t = target.withColumn(InT, lit(true)).as("t")
    val s = source.withColumn(InS, lit(true))
      .withColumn(NMatches, count(lit(1)).over(bySourceKey)).as("s")
    val on = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
    t.join(s, on, "full_outer")
  }

  /** Wrap an output column with the cardinality guard: throw if this row's
    * target matched more than one source row.
    */
  private def guarded(matched: Column, keys: Seq[String])(base: Column): Column =
    when(matched && col(NMatches) > 1,
        raise_error(concat(
          lit(s"MERGE cardinality violation on key ${keys.mkString(",")}: "),
          lit("a target row is matched by multiple source rows"))))
      .otherwise(base)

  /** Default value of an unmapped target column on INSERT: the same-named
    * source column when the source has one, else a typed NULL — a change feed
    * narrower than the target must still merge (its inserts simply leave the
    * missing columns null, as SQL INSERT with a column list would).
    */
  private def insertDefault(target: DataFrame, source: DataFrame)(c: String): Column =
    if (source.columns.contains(c)) col(s"s.$c")
    else lit(null).cast(target.schema(c).dataType)

  /** Execute the merge; returns the post-merge target relation (target
    * schema). `updateSet`/`insertValues` map target column name → expression;
    * unmapped columns keep `t.<col>` on update and take `s.<col>` (or typed
    * NULL if the source lacks the column) on insert.
    */
  def mergeInto(target: DataFrame, source: DataFrame, keys: Seq[String],
      deleteWhen: Option[Column] = None,
      updateWhen: Option[Column] = None, updateSet: Map[String, Column] = Map.empty,
      insertWhen: Option[Column] = None,
      insertValues: Map[String, Column] = Map.empty): DataFrame = {
    val j = joined(target, source, keys)
    val matched = col(InT).isNotNull && col(InS).isNotNull
    val deleted = matched && deleteWhen.getOrElse(lit(false))
    val updated = matched && !deleteWhen.getOrElse(lit(false)) &&
      updateWhen.getOrElse(lit(false))
    val inserted = col(InT).isNull && col(InS).isNotNull &&
      insertWhen.getOrElse(lit(true))
    val keep = (matched && !deleteWhen.getOrElse(lit(false))) ||
      (col(InT).isNotNull && col(InS).isNull) || inserted
    // the guard rides the output columns so pruning cannot drop it
    val outCols = target.columns.toSeq.map { c =>
      guarded(matched, keys)(
        when(updated, updateSet.getOrElse(c, col(s"t.$c")))
          .when(inserted, insertValues.getOrElse(c, insertDefault(target, source)(c)))
          .otherwise(col(s"t.$c")))
        .as(c)
    }
    j.filter(keep).select(outCols: _*)
  }

  /** Deletion-vector flavor — how a 100 TB merge avoids rewriting the
    * target: instead of the merged relation, emit (dv, appends) where `dv`
    * is the invalidation set (keys of target rows DELETED or SUPERSEDED by
    * an update) and `appends` holds the new row images (updated rows +
    * inserts). The contract, spec-pinned: `target ∖ dv ∪ appends` equals
    * [[mergeInto]]'s output exactly. The reader applies `dv` as a filter
    * (the deletion-vector read path); the writer appends `appends`; no base
    * file is rewritten.
    */
  def mergeDeletionVector(target: DataFrame, source: DataFrame, keys: Seq[String],
      deleteWhen: Option[Column] = None,
      updateWhen: Option[Column] = None, updateSet: Map[String, Column] = Map.empty,
      insertWhen: Option[Column] = None,
      insertValues: Map[String, Column] = Map.empty): (DataFrame, DataFrame) = {
    val j = joined(target, source, keys)
    val matched = col(InT).isNotNull && col(InS).isNotNull
    val deleted = matched && deleteWhen.getOrElse(lit(false))
    val updated = matched && !deleteWhen.getOrElse(lit(false)) &&
      updateWhen.getOrElse(lit(false))
    val inserted = col(InT).isNull && col(InS).isNotNull &&
      insertWhen.getOrElse(lit(true))
    // same guard as mergeInto, on both projections: an ambiguous source must
    // fail the DV flavor identically, not silently emit duplicate dv/append
    // rows that break the `target \ dv ∪ appends ≡ mergeInto` identity
    val dv = j.filter(deleted || updated)
      .select(keys.map(k => guarded(matched, keys)(col(s"t.$k")).as(k)): _*)
    val appends = j.filter(updated || inserted)
      .select(target.columns.toSeq.map { c =>
        guarded(matched, keys)(
          when(updated, updateSet.getOrElse(c, col(s"t.$c")))
            .when(inserted, insertValues.getOrElse(c, insertDefault(target, source)(c)))
            .otherwise(col(s"t.$c")))
          .as(c)
      }: _*)
    (dv, appends)
  }

  /** Oracle-gated instantiation (q103): the customer dimension merged with a
    * deterministic change feed — every 10th customer is retired (DELETE),
    * every 4th (not also 10th) re-arrives with a +100.00 balance adjustment
    * and a new segment (UPDATE), and every 6th spawns a NEW customer under a
    * shifted key (INSERT). All arithmetic is exact IEEE, keys are disjoint by
    * construction, and the oracle rebuilds the same final state in plain SQL.
    */
  def customerMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
    val deletes = cust.filter(pmod(col("c_custkey"), lit(10)) === 0)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_mktsegment"), lit("delete").as("op"))
    val updates = cust
      .filter(pmod(col("c_custkey"), lit(4)) === 0 && pmod(col("c_custkey"), lit(10)) =!= 0)
      .select(col("c_custkey"), col("c_name"), lit(100.0).as("c_acctbal"),
        lit("MERGED").as("c_mktsegment"), lit("upsert").as("op"))
    val inserts = cust.filter(pmod(col("c_custkey"), lit(6)) === 0)
      .select((col("c_custkey") + 10000000L).as("c_custkey"),
        concat(lit("NEW-"), col("c_name")).as("c_name"),
        lit(500.0).as("c_acctbal"), lit("NEWSEG").as("c_mktsegment"),
        lit("upsert").as("op"))
    mergeInto(cust, deletes.unionByName(updates).unionByName(inserts),
      keys = Seq("c_custkey"),
      deleteWhen = Some(col("s.op") === "delete"),
      updateWhen = Some(col("s.op") === "upsert"),
      updateSet = Map(
        "c_acctbal" -> (col("t.c_acctbal") + col("s.c_acctbal")),
        "c_mktsegment" -> col("s.c_mktsegment")),
      insertWhen = Some(col("s.op") === "upsert"))
  }

  /** TABLE DIFF — the anti-entropy primitive: classify every key as
    * `missing_in_right` (left only), `missing_in_left` (right only) or
    * `changed` (present on both sides with any non-key column differing,
    * null-safely); identical rows are omitted, so the output IS the repair
    * set a replica-sync job would apply. One full-outer shuffle on the
    * keys; the row images travel as single structs so the comparison is
    * one null-safe equality regardless of column count. At 100 TB, run it
    * per partition / per bucket and union — the classification is
    * embarrassingly key-parallel.
    */
  def tableDiff(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val nonKeys = left.columns.filterNot(keys.contains).toSeq
    require(right.columns.filterNot(keys.contains).toSeq == nonKeys,
      "tableDiff requires identical schemas")
    def packed(df: DataFrame, side: String): DataFrame =
      df.select(keyCols :+
        struct(nonKeys.map(col): _*).as(s"row_$side") :+
        lit(true).as(s"in_$side"): _*)
    packed(left, "l").join(packed(right, "r"), keys, "full_outer")
      .withColumn("diff_type",
        when(col("in_r").isNull, "missing_in_right")
          .when(col("in_l").isNull, "missing_in_left")
          .when(!(col("row_l") <=> col("row_r")), "changed"))
      .filter(col("diff_type").isNotNull)
      .select(keyCols :+ col("diff_type"): _*)
  }
}
