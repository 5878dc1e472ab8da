package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the Morton-key bit layout (x in even positions, y in odd), the
  * equivalence of the mask-shift fast path against a bit-by-bit reference,
  * codegen/interpreted agreement through a real DataFrame, and the locality
  * property the layout exists for: a z-sorted run splits into files whose
  * min/max ranges are tight on BOTH dimensions.
  */
class ZOrderExprSpec extends SparkSpec {

  private def reference(x: Long, y: Long): Long =
    (0 until 16).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("mask-shift interleave ≡ bit-by-bit reference on edges and a sweep") {
    val edges = Seq(0L, 1L, 2L, 3L, 255L, 256L, 65535L, 65536L, 123456L)
    for (x <- edges; y <- edges)
      assert(ZOrderExpr.interleave(x, y) == reference(x & 0xffffL, y & 0xffffL),
        s"x=$x y=$y")
    for (s <- 0 until 2000) {
      val x = (s * 2654435761L) & 0xffffL
      val y = (s * 40503L) & 0xffffL
      assert(ZOrderExpr.interleave(x, y) == reference(x, y))
    }
  }

  test("x occupies even bits, y odd bits; key is monotone per axis at fixed other") {
    assert(ZOrderExpr.interleave(0xffffL, 0L) == 0x55555555L)
    assert(ZOrderExpr.interleave(0L, 0xffffL) == 0xaaaaaaaaL)
    val ys = (0 until 100).map(y => ZOrderExpr.interleave(7L, y.toLong))
    assert(ys == ys.sorted && ys.distinct.size == ys.size)
  }

  test("expression through a DataFrame (codegen path) matches the JVM compute") {
    import spark.implicits._
    val rows = (0L until 512L).map(i => (i, (i * 37L) % 65536L, (i * 101L) % 65536L))
      .toDF("id", "x", "y")
      .select($"id", ZOrderExpr($"x", $"y").as("z"),
        $"x", $"y")
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == ZOrderExpr.interleave(r.getLong(2), r.getLong(3)))
    }
  }

  test("z-sorted layout yields per-file ranges tight on BOTH dimensions") {
    import spark.implicits._
    val n = 64 // 64×64 grid
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .select($"x", $"y", ZOrderExpr($"x", $"y").as("z"))
    val files = 16
    val ranges = graft.ops.Relational.zOrderLayout(grid, "z", files)
      .mapPartitions { it =>
        val rows = it.toVector
        if (rows.isEmpty) Iterator.empty
        else Iterator((rows.map(_.getLong(0)).min, rows.map(_.getLong(0)).max,
          rows.map(_.getLong(1)).min, rows.map(_.getLong(1)).max))
      }(org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
      .collect()
    assert(ranges.length >= files / 2)
    // most "files" (partitions) span at most half the grid on EACH axis — a
    // single-column sort would leave the other axis at the full range in
    // EVERY file. Not all: a z-run straddling a top-level quadrant boundary
    // (e.g. the y bit at 2048) legitimately spans one axis, so the claim is
    // a strong majority, not totality.
    val local = ranges.count { case (x0, x1, y0, y1) =>
      x1 - x0 <= n / 2 && y1 - y0 <= n / 2
    }
    assert(local >= (ranges.length * 0.6).toInt,
      s"only $local of ${ranges.length} files are locality-bounded")
  }

  test("non-bigint inputs fail at analysis, not at execution") {
    import spark.implicits._
    // an IntegerType input used to pass analysis, then ClassCastException in
    // interpreted eval while codegen silently widened — the type contract
    // must reject it before either path runs
    val ints = Seq((1, 2)).toDF("x", "y")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(ZOrderExpr($"x", $"y")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("z_order") ||
      e.getMessage.toLowerCase.contains("bigint"))
  }
}
