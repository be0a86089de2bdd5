package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Numeric helpers that make aggregates ORACLE-EXACT and order-independent.
  *
  * Double summation is order-dependent (IEEE754 addition is not
  * associative), and Spark's partial-agg/shuffle order differs from a
  * sequential scan, so `sum(double)` differs run-to-run in the last bits
  * — enough to fail a hash compare and, at 100 TB, to drift real money
  * totals. We therefore sum in exact DECIMAL.
  *
  * Two cross-engine pitfalls shape the exact design (verified against
  * DuckDB empirically):
  *   1. Downscaling a decimal truncates in some engines and rounds
  *      half-up in others → NEVER rescale a decimal down.
  *   2. Casting a wide/high-scale decimal to double is only correctly
  *      rounded when the unscaled value fits in 2^53 → keep scales
  *      minimal (money data is 2-decimal; rates are ≤4-decimal) so the
  *      final cast is a single correctly-rounded IEEE division.
  */
object Num {
  private val D2 = DecimalType(18, 2)
  private val D6 = DecimalType(18, 6)

  // Multiply operands are deliberately NARROW: Spark's Decimal stays
  // long-backed ("compact") only while values fit 18 digits, and a
  // product's declared precision is p1+p2+1 — two (18,2) operands force
  // every per-row multiply onto java.math.BigDecimal (measured 4× on
  // the conditional-agg bench query). (10,2)×(4,2)→(15,4) and
  // (10,2)×(6,4)→(17,6) keep the whole multiply-sum pipeline compact.
  // Value range: money columns < 10^8 currency units, rates in [0, 99],
  // both exact at these scales, so results are bit-identical to the
  // wide form (the sums overflow to BigDecimal only past ~9·10^14 —
  // correctness is preserved there, just not the fast path).
  private val DMoney = DecimalType(10, 2)
  private val DRate2 = DecimalType(4, 2)
  private val DRate4 = DecimalType(6, 4)

  /** Exact decimal view of a 2-decimal money column. */
  def dec(c: Column): Column = c.cast(D2)

  /** Exact decimal view of a ≤4-decimal rate/factor expression. */
  def dec4(c: Column): Column = c.cast(DRate4)

  // First-level fact-table sums go through DecSum128 (round 16): Spark's
  // Sum(decimal(p≤18, s)) widens every row to the non-compact p+10
  // precision, paying a java.math.BigDecimal allocation+add per row —
  // measured 887 ms vs 292 ms (decimal vs double aggs) on q01's
  // single-row-group scan task at sf0.1. DecSum128 accumulates the
  // unscaled longs in signed-128 integer arithmetic (codegen'd long
  // adds, no per-row allocation) and materializes one BigDecimal per
  // GROUP at the end — bit-identical results incl. null/overflow/ANSI
  // semantics (DecSumSpec pins equality against stock Sum).
  private def decSum(c: Column): Column = org.apache.spark.sql.GraftBridge
    .toColumn(DecSum128(org.apache.spark.sql.GraftBridge.toExpression(c))
      .toAggregateExpression())

  /** Order-independent sum of a money column, as double (sum scale 2). */
  def dsum(c: Column): Column = decSum(dec(c)).cast(DoubleType)

  /** Order-independent sum of money × rate2 product (sum scale 4). */
  def dsum2(a: Column, b: Column): Column =
    decSum(a.cast(DMoney) * b.cast(DRate2)).cast(DoubleType)

  /** Order-independent sum of money × rate4 product (sum scale 6). */
  def dsum24(a: Column, b: Column): Column =
    decSum(a.cast(DMoney) * b.cast(DRate4)).cast(DoubleType)

  /** Order-independent sum of a 6-decimal measure column (sum scale 6). */
  def dsum6(c: Column): Column = decSum(c.cast(D6)).cast(DoubleType)

  /** Deterministic average: exact decimal sum, double-divided by count. */
  def davg(c: Column): Column = decSum(dec(c)).cast(DoubleType) / count(lit(1))

  // Two-phase (pre-agg → rollup/cube) forms: Spark's Expand duplicates
  // every input row per grouping set BEFORE aggregation, so a rollup
  // over a fact table processes a multiple of the fact rows. Decimal
  // sums and counts re-aggregate exactly, so the scalable form is:
  // groupBy(finest grouping).agg(dsumPartial…) → rollup/cube over the
  // tiny intermediate → finishDouble. Results are bit-identical to the
  // one-phase form (same exact rational, one final cast).

  /** Exact decimal partial sum of a money column (finish with [[finishDouble]]).
    * DecSum128-backed: the output type (decimal(p+10, s)) matches stock
    * Sum exactly, so the finishing re-aggregation is unchanged. */
  def dsumPartial(c: Column): Column = decSum(dec(c))

  /** Exact decimal partial sum of money × rate2 (finish with [[finishDouble]]). */
  def dsum2Partial(a: Column, b: Column): Column =
    decSum(a.cast(DMoney) * b.cast(DRate2))

  /** Re-aggregate exact decimal partials to the final double. */
  def finishDouble(partial: Column): Column = sum(partial).cast(DoubleType)

  /** Driver-side scale-0 rounding with the semantics BOTH engines'
    * `round()` applies to a DOUBLE — half AWAY from zero at an exact
    * binary .5, floor/ceil elsewhere (java.lang.Math.round differs:
    * it is floor(x+0.5), which rounds −2.5 UP to −2 and mis-rounds
    * doubles one ulp below a half). Used where an eigensolve/statistic
    * computed on the driver re-enters the plan as an integer literal
    * that a DuckDB `CAST(round(x) AS BIGINT)` must reproduce
    * (emb05/emb06). */
  def rhalf(x: Double): Long = {
    val f = math.floor(x)
    val frac = x - f
    if (frac > 0.5) f.toLong + 1
    else if (frac < 0.5) f.toLong
    else if (x >= 0) f.toLong + 1 else f.toLong
  }
}
