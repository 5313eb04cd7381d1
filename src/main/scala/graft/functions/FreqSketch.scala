package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items state: at most `c` counters plus the
  * consumed stream length (`n` lets a caller compute the error bound
  * n/(c+1) without a second pass). */
case class MGState(counters: Map[String, Long], n: Long)

/** Misra-Gries heavy-hitters sketch as a typed, MERGEABLE `Aggregator` —
  * the fixed-size distributed summary for "which values dominate this
  * column" at any scale (the reference has no sketch operators; this is
  * part of the declared engine surface alongside HLL approx-distinct
  * and approximate quantiles).
  *
  * Guarantees (standard MG, preserved under the summary merge of
  * Agarwal et al., "Mergeable Summaries", PODS'12):
  *   - state is at most `c` counters regardless of stream length or
  *     partition count — each partial aggregate ships O(c), never O(N);
  *   - every estimate undercounts: true(x) − n/(c+1) ≤ est(x) ≤ true(x);
  *   - therefore every value with true count > n/(c+1) is IN the sketch
  *     (zero false negatives above the threshold; values below it may
  *     appear and are filtered by the caller if exactness matters).
  *
  * reduce() is O(1) amortized per element (the decrement-all branch
  * runs at most once per c insertions); merge() sums two summaries and
  * subtracts the (c+1)-th largest count from all — the canonical
  * mergeable-MG trim.
  */
class FreqItems(c: Int) extends Aggregator[String, MGState, Map[String, Long]] {
  require(c >= 1, s"need at least one counter, got $c")

  override def zero: MGState = MGState(Map.empty, 0L)

  override def reduce(b: MGState, a: String): MGState = {
    val m = b.counters
    val next =
      if (m.contains(a)) m.updated(a, m(a) + 1L)
      else if (m.size < c) m.updated(a, 1L)
      else m.collect { case (k, v) if v > 1L => k -> (v - 1L) } // decrement-all, drop zeros; `a` not inserted
    MGState(next, b.n + 1L)
  }

  override def merge(x: MGState, y: MGState): MGState = {
    val sum = (x.counters.keySet ++ y.counters.keySet).iterator
      .map(k => k -> (x.counters.getOrElse(k, 0L) + y.counters.getOrElse(k, 0L)))
      .toMap
    val trimmed =
      if (sum.size <= c) sum
      else {
        val d = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse).apply(c) // (c+1)-th largest
        sum.collect { case (k, v) if v > d => k -> (v - d) }
      }
    MGState(trimmed, x.n + y.n)
  }

  override def finish(b: MGState): Map[String, Long] = b.counters

  override def bufferEncoder: Encoder[MGState] = Encoders.product[MGState]
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
