package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic numeric helpers.
  *
  * `round(sum/count/1e6, 6)` over quantized micro-unit longs is exact in
  * BOTH engines right up until the true mean lands on an exact half-unit
  * (e.g. 376299/6 = 62716.5 micro-units — observed in the sf1 study):
  * Spark's round() is decimal HALF_UP over the shortest string rendering
  * while DuckDB resolves the same double one ulp the other way, so the
  * two engines emit values 1e-6 apart. The fix is to never round a
  * float: do the half-up division in pure long arithmetic and only THEN
  * divide by the unit — one IEEE division of exact integers, identical
  * everywhere.
  */
object Num {

  /** Half-up integer division `round(num / den)` for long columns with
    * `den > 0`; negative numerators round away from zero (matching
    * decimal HALF_UP). floor((2n + d) / (2d)) in exact long arithmetic.
    *
    * DuckDB twin spelling:
    * `CASE WHEN n >= 0 THEN (2*n + d) // (2*d)
    *       ELSE -((-2*n + d) // (2*d)) END`.
    */
  def halfUpDiv(num: Column, den: Column): Column = {
    // IntegralDivide (SQL `div`) keeps the whole computation in longs —
    // a floor(double/double) spelling would lose exactness past 2^53,
    // which 10⁻⁶-unit sums at 100 TB genuinely reach.
    def pos(n: Column) = call_function("div", n * 2 + den, den * 2)
    when(num >= 0, pos(num)).otherwise(-pos(-num))
  }

  /** Exact mean of `unit`-quantized longs, displayed in original units:
    * half-up to the nearest quantum in long arithmetic, then ONE exact
    * integer-valued division. `scale` is the quantization factor (1e6
    * for micro-units).
    */
  def quantMean(sumQ: Column, count: Column, scale: Double): Column =
    halfUpDiv(sumQ, count).cast("double") / scale
}
