package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine numeric parity helpers (SURVEY.md §7 "hard parts").
  *
  * Problem: double summation is order-dependent; Spark's partial/final
  * aggregation over 32 partitions sums in a different order than the DuckDB
  * oracle, so `sum(double)` can differ in the last ulp and flip a rounded
  * digit exactly at a .xx5 boundary. The reference's inputs are 2-decimal
  * currency-ish values (and its own outputs are `round(2)` —
  * reference scripts/process_climate_amazon_monthly.py:452-455), so the fix
  * is exact decimal accumulation:
  *
  *   sum:  sum(CAST(x AS DECIMAL(18,2)))  — exact, order-independent,
  *         identical in Spark and DuckDB; cast to DOUBLE afterwards.
  *   avg:  exact decimal sum cast to double, divided by count — one IEEE
  *         division of identical operands on both engines.
  *   std:  exact decimal sums of x and x*x, variance computed in double from
  *         identical operands.
  *
  * Rounding: SUMS and std use half-even (Spark `bround` == DuckDB
  * `round_even` == pandas/numpy `round(2)`, matching the reference's
  * output semantics) — safe because an exact decimal sum never lands on a
  * true 2-dp midpoint. MEANS (`avg2`/`sqlAvg2`) instead use the HALF-UP
  * floor form floor(x*100+0.5)/100: a decimal sum divided by a count DOES
  * land on true midpoints, where bround (rounds the shortest decimal
  * rendering) and round_even (rounds the binary value) disagree — see the
  * avg2 scaladoc. New operators: sums → sum2, means → avg2/Text.hround.
  *
  * At 100 TB these stay single-pass partial+final hash aggregations — decimal
  * sums are Tungsten-native and codegen'd; there is no extra shuffle.
  */
object Num {
  private val Dec = DecimalType(18, 2)

  /** Exact decimal sum of a 2-dp double column, as DOUBLE. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** sum rounded half-even to 2 dp (reference output precision). */
  def sum2(c: Column): Column = bround(dsum(c), 2)

  /** mean rounded to 2 dp, exact-sum based. Rounding is HALF-UP via
    * floor(x*100 + 0.5)/100 rather than bround: an exact-decimal sum divided
    * by a count lands on TRUE 2-dp midpoints (e.g. 649452.45/10 =
    * 64945.245), where Spark's bround (rounds the shortest decimal
    * representation of the double) and DuckDB's round_even (rounds the
    * binary value) disagree. floor(x*100+0.5)/100 is a chain of IEEE ops
    * each bit-identical on both engines — no midpoint ambiguity.
    */
  def avg2(c: Column): Column =
    floor(dsum(c) * lit(100.0) / count(c) + lit(0.5)) / lit(100.0)

  /** Sample standard deviation from exact decimal sums, rounded to 4 dp. */
  def std4(c: Column): Column = {
    val d  = c.cast(Dec)
    val s  = sum(d).cast(DoubleType)
    val s2 = sum(d * d).cast(DoubleType)
    val n  = count(c).cast(DoubleType)
    bround(sqrt((s2 - s * s / n) / (n - lit(1.0))), 4)
  }

  /** SQL fragments with the same bit-exact semantics, for the DuckDB oracle. */
  def sqlSum2(x: String): String =
    s"round_even(CAST(sum(CAST($x AS DECIMAL(18,2))) AS DOUBLE), 2)"
  def sqlAvg2(x: String): String =
    s"floor(CAST(sum(CAST($x AS DECIMAL(18,2))) AS DOUBLE) * 100.0 / count($x) + 0.5) / 100.0"
  def sqlStd4(x: String): String =
    s"round_even(sqrt((CAST(sum(CAST($x AS DECIMAL(18,2)) * CAST($x AS DECIMAL(18,2))) AS DOUBLE) - " +
      s"CAST(sum(CAST($x AS DECIMAL(18,2))) AS DOUBLE) * CAST(sum(CAST($x AS DECIMAL(18,2))) AS DOUBLE) / count($x)) / (count($x) - 1.0)), 4)"

  /** Snap a continuous coordinate to the nearest multiple of `grid`.
    * floor-based (floor(x/g + 0.5) * g) rather than round-based so both
    * engines agree at midpoints (Spark round = HALF_UP, DuckDB = HALF_EVEN;
    * floor has a single definition). This is the J2 snap-to-grid key
    * (reference `sel(..., method='nearest')`,
    * scripts/process_climate_amazon_monthly.py:253-256): on a regular grid,
    * nearest-neighbor == equality on the snapped key.
    */
  def snap(c: Column, grid: Double): Column =
    floor(c / lit(grid) + lit(0.5)) * lit(grid)

  def sqlSnap(x: String, grid: Double): String =
    s"floor($x / $grid + 0.5) * $grid"
}
