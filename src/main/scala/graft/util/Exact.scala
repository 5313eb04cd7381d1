package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent, cross-engine-exact float aggregation.
  *
  * Summing doubles is order-dependent at the last few ulps, and Spark's
  * partial/final aggregation order differs run-to-run and engine-to-engine
  * — so a raw `sum(double)` can never hash-match a DuckDB oracle reliably.
  *
  * The fix must also avoid `CAST(double AS DECIMAL)`: Spark routes that
  * cast through `Double.toString` (shortest-representation), while DuckDB
  * rounds the full binary value, and the two disagree on values with more
  * decimal digits than the target scale (observed on TPC-H Q1 sum_charge).
  *
  * So quantization stays entirely in IEEE double arithmetic, where both
  * engines are bit-identical: per row `floor(x*10000 + 0.5)` yields an
  * integral double; a sum of integral doubles below 2^53 is exact and
  * order-independent; the final division by 10000 is correctly rounded.
  *
  * DuckDB-side spelling of `dsum(x)`:
  * `(SUM(FLOOR((x) * 10000.0 + 0.5)) / 10000.0)`.
  */
object Exact {
  private val Scale = 10000.0

  /** Exact (4-decimal-quantized) sum of a double column. */
  def dsum(c: Column): Column = sum(floor(c * lit(Scale) + lit(0.5))) / lit(Scale)

  /** Exact average (quantized sum / count — identical division both sides). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL spelling helpers so Spark and oracle text stay in lockstep. */
  def sqlSum(expr: String): String =
    s"(SUM(FLOOR(($expr) * 10000.0 + 0.5)) / 10000.0)"
  def sqlAvg(expr: String): String =
    s"(${sqlSum(expr)} / COUNT($expr))"
}
