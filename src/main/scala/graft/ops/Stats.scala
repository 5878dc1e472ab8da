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
  * One pass over the table: every per-column aggregate lives in a single
  * wide `agg` (count + per-column null-count/NDV/min/max), so the scan and
  * shuffle happen once regardless of column count; the per-column rows are
  * unpivoted from that one aggregated row with `stack` — driver never sees
  * data. Exact NDV is the expensive-but-gateable choice here;
  * `approx_count_distinct` (q61's HLL) is the documented one-pass sketch
  * swap at 100 TB.
  *
  * Min/max surface typed: numerics as doubles (IEEE-representable exactly
  * for TPC-H money/ints), strings as-is, timestamps as epoch micros —
  * avoiding engine-specific string formatting of doubles/timestamps, which
  * is NOT portable across engines.
  */
object Stats {

  def tableStats(spark: SparkSession, sfDir: String): DataFrame = {
    val df = Tables.lineitem(spark, sfDir)
    val fields = df.schema.fields.toSeq

    def minMax(f: StructField, agg: String): org.apache.spark.sql.Column = {
      val base = if (agg == "min") min(col(f.name)) else max(col(f.name))
      f.dataType match {
        case _: NumericType => base.cast("double")
        case _: TimestampNTZType | _: TimestampType =>
          if (agg == "min") min(unix_micros(col(f.name).cast("timestamp"))).cast("double")
          else max(unix_micros(col(f.name).cast("timestamp"))).cast("double")
        case _ => lit(null).cast("double")
      }
    }
    def minMaxStr(f: StructField, agg: String): org.apache.spark.sql.Column =
      f.dataType match {
        case StringType =>
          if (agg == "min") min(col(f.name)) else max(col(f.name))
        case _ => lit(null).cast("string")
      }

    val aggs = Seq(count(lit(1)).as("n_rows")) ++ fields.flatMap { f =>
      Seq(
        sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"${f.name}__nulls"),
        count_distinct(col(f.name)).as(s"${f.name}__ndv"),
        minMax(f, "min").as(s"${f.name}__min_num"),
        minMax(f, "max").as(s"${f.name}__max_num"),
        minMaxStr(f, "min").as(s"${f.name}__min_str"),
        minMaxStr(f, "max").as(s"${f.name}__max_str"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)

    // unpivot the single aggregated row into one row per column
    val stackExpr = fields.map { f =>
      s"'${f.name}', ${f.name}__nulls, ${f.name}__ndv, " +
        s"${f.name}__min_num, ${f.name}__max_num, ${f.name}__min_str, ${f.name}__max_str"
    }.mkString(", ")
    wide.select(col("n_rows"), expr(
      s"stack(${fields.size}, $stackExpr) AS " +
        "(column_name, n_nulls, ndv, min_num, max_num, min_str, max_str)"))
      .select(col("column_name"), col("n_rows"), col("n_nulls"), col("ndv"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
  }
}
