package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic money / numeric helpers.
  *
  * The engine's correctness gate hash-compares values against a DuckDB oracle, so
  * every aggregate over doubles must be bit-reproducible regardless of partitioning
  * and row order. Doubles are summed by first casting to decimal (exact, associative,
  * order-independent) and casting the exact result back to double at the end —
  * both conversions are deterministic and identical across engines.
  *
  * A double→decimal cast can never hit a rounding tie: a tie at scale s requires the
  * value (2k+1)/(2·10^s), whose denominator is not a power of two, so it is not
  * representable as a binary double. Hence HALF_UP (Spark) and any half-away/half-even
  * variant agree on every double input.
  *
  * The reference rides raw inferred doubles and rounds only at the very end
  * (`/root/reference/src/transform/transform.py:154`) — fine for one laptop, not
  * reproducible across a 1000-executor shuffle.
  */
object Num {

  /** Exact, order-independent sum of a 2-decimal money column → double. */
  def sumMoney(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum of a per-row double expression carrying up to 4 decimals. */
  def sum4(c: Column): Column = sum(c.cast(DecimalType(22, 4))).cast("double")

  /** Order-independent mean: exact decimal sum divided (IEEE, deterministic). */
  def avgMoney(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double") / count(lit(1))

  /** Revenue expression used throughout: extendedprice * (1 - discount).
    * The per-row double product is IEEE-deterministic; sums of it go through sum4.
    */
  def revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Decimal→double through a string bridge. Spark's direct cast
    * (BigDecimal.doubleValue) and DuckDB's direct cast (int128 ÷ 10^scale)
    * can each land 1 ulp off the nearest double for wide/high-scale values —
    * in OPPOSITE directions — while both engines' string→double parses are
    * correctly rounded. Any oracle-checked output derived from a decimal
    * with more than ~4 fractional digits or > 18 total digits should cross
    * through this (the SQL twin: `CAST(CAST(x AS VARCHAR) AS DOUBLE)`).
    */
  def decToDouble(c: Column): Column = c.cast("string").cast("double")
}
