package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact-arithmetic aggregation helpers.
  *
  * Summing doubles is order-dependent, and Spark's partial/final aggregation
  * order is nondeterministic across runs and engines. For differential-oracle
  * parity (and for reproducible results on a 1000-executor cluster) every
  * SUM/AVG over a fixed-decimal-valued column goes through DecimalType:
  * decimal sums are exact and associative, so the result is bit-identical
  * regardless of partitioning, and casting the exact decimal back to double
  * yields the same IEEE value in any engine.
  *
  * This costs little: decimal sum is still a single-pass partial+final
  * hash aggregate (map-side combine preserved), just with a 128-bit
  * accumulator instead of 64-bit.
  */
object Exact {

  /** Cast a fixed-decimal-valued double column to decimal for exact math. */
  def dec(c: Column, scale: Int = 2, prec: Int = 18): Column =
    c.cast(DecimalType(prec, scale))

  /** Exact sum of a column whose values carry at most `scale` decimals. */
  def exactSum(c: Column, scale: Int = 2, prec: Int = 18): Column =
    sum(dec(c, scale, prec)).cast(DoubleType)

  /** Deterministic average: exact decimal sum, cast to double, divided by the
    * non-null count. Both operands are bit-identical across engines, so the
    * quotient is too.
    */
  def exactAvg(c: Column, scale: Int = 2, prec: Int = 18): Column =
    sum(dec(c, scale, prec)).cast(DoubleType) / count(c)

  /** Order-invariant AVG for columns that are NOT fixed-decimal: decimal(38,12)
    * rounds each double at the 12th decimal (error ≤ 5e-13 — far below any
    * published tolerance) and then sums EXACTLY, so the result is identical
    * under any partitioning, row order, or plan change. Used by the health
    * analytics layer so a replan of the ETL can never shift a reported
    * aggregate by an ulp (the reference's own pandas sums are order-fixed;
    * ours must be order-FREE to match from a distributed engine).
    */
  def stableAvg(c: Column): Column = exactAvg(c, 12, 38)

  /** Order-invariant SUM, same decimal(38,12) contract as [[stableAvg]]. */
  def stableSum(c: Column): Column = exactSum(c, 12, 38)

  /** clip(lo, hi) — the reference's pandas `Series.clip` (SURVEY §2.3 F8). */
  def clip(c: Column, lo: Column, hi: Column): Column =
    greatest(lo, least(hi, c))
}
