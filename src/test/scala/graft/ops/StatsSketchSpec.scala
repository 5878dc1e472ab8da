package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The HLL-NDV stats variant (q131) is rows-only at the driver gate (sketch
  * estimates are engine-specific, like q61/q71), so its two contracts are
  * pinned here instead:
  *
  *  1. SLICE INVARIANCE — per-slice sketches merged with `hll_union_agg`
  *     estimate identically no matter how the table was sliced: HLL
  *     register content is a pure per-bucket max over the hashed item set,
  *     and max is associative, so ANY partition of the rows merges to the
  *     same register state. This is the property that lets NDV ride the
  *     incremental stats path without rescanning the snapshot. (A
  *     never-merged single sketch is NOT the comparison point: it reports
  *     the order-dependent HIP estimator that a multi-input union
  *     deliberately discards — merged and single-pass differ by ~0.1%
  *     while both sit inside the same bound.)
  *  2. ACCURACY — each estimate lands within the published HLL error bound
  *     of the exact NDV: relative standard error 1.04/sqrt(2^lgK); we
  *     assert 3 sigma (lgK=12 → 4.9%), plus a small-cardinality floor for
  *     columns the sketch counts exactly (list/set mode).
  *
  * Exact twins use count(distinct cast(c as string)) — the sketch hashes the
  * same string domain, so the comparison is apples-to-apples.
  */
class StatsSketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("merged estimates are invariant to how the table was sliced") {
    val two = Stats.approxTableStats(spark, sf)   // default single cut, 2 slices
    val four = Stats.approxTableStats(spark, sf,
      cuts = Seq("1995-06-01", "1997-01-01", "1998-06-01"))
    val m2 = two.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val m4 = four.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(m2.keySet === m4.keySet)
    m2.foreach { case (c, ndv) =>
      assert(ndv === m4(c), s"column $c: 2-slice $ndv != 4-slice ${m4(c)}")
    }
  }

  test("every estimate is within the 3-sigma HLL bound of exact NDV; counts exact") {
    val li = graft.core.Tables.lineitem(spark, sf)
    val approx = Stats.approxTableStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val nRows = li.count()
    val sigma3 = 3 * 1.04 / math.sqrt(1 << 12)   // lgK = 12 default
    assert(approx.length === li.schema.fields.length, "one row per column")
    approx.foreach { case (name, rows, nulls, ndv) =>
      assert(rows === nRows, s"$name n_rows")
      val exactNulls = li.filter(col(name).isNull).count()
      assert(nulls === exactNulls, s"$name n_nulls")
      val exact = li.select(countDistinct(col(name).cast("string"))).head.getLong(0)
      val tol = math.max(sigma3 * exact, 2.0)
      assert(math.abs(ndv - exact) <= tol,
        s"$name: approx NDV $ndv vs exact $exact exceeds 3-sigma bound $tol")
    }
  }
}
