package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Compactor-sketch state: `levels(h)` holds items of weight 2^h;
  * `parities(h)` alternates which half survives the next compaction of
  * level h; `err` is the ACCUMULATED worst-case rank-error bound (one
  * `2^h` term per level-h compaction), so the finished sketch carries
  * its own exactness certificate — no second pass needed to know how
  * wrong it can be. */
case class QSketchState(
    levels: Seq[Seq[Double]],
    parities: Seq[Boolean],
    n: Long,
    err: Long)

/** Finished summary: (value, weight) pairs sorted by value, the consumed
  * stream length, and the worst-case rank-error bound. Estimated rank of
  * any value v = sum of weights at values ≤ v, correct within ±err. */
case class QSummary(values: Seq[Double], weights: Seq[Long], n: Long, err: Long)

object QSummary {

  /** Smallest summary value whose estimated rank reaches ceil(q·n) —
    * the classic rank-target quantile readout. Returns NaN on an empty
    * summary. Pure and driver-cheap: a summary has ≤ k·log2(n/k) entries. */
  def estimate(values: Seq[Double], weights: Seq[Long], n: Long, q: Double): Double = {
    if (values.isEmpty) return Double.NaN
    val target = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    var i = 0
    while (i < values.length) {
      cum += weights(i)
      if (cum >= target) return values(i)
      i += 1
    }
    values(values.length - 1)
  }
}

/** Deterministic one-pass quantile sketch as a typed, MERGEABLE
  * `Aggregator` — the 100 TB percentile primitive (complements the
  * built-in `percentile_approx`; this one is ours, carries an explicit
  * error certificate, and its state is a few KB regardless of input
  * size).
  *
  * Design: Manku–Rajagopalan–Lindsay-style compactor hierarchy (the
  * deterministic ancestor of KLL — Karnin/Lang/Liberty FOCS'16 keep the
  * same structure with randomized parity; we alternate parity instead,
  * so no RNG and no seed plumbing). Level h holds items of weight 2^h in
  * a buffer of capacity k. A full buffer is sorted and every other item
  * (alternating start offset) is promoted to level h+1 at double weight;
  * one compaction perturbs any rank query by at most 2^h, and `err`
  * accumulates exactly those terms, so the finished bound is
  * Σ_h C_h·2^h ≈ log2(n/k)·n/k — e.g. ~3% of n at n=60 000, k=256.
  *
  * Merge is buffer concatenation level-wise followed by the same
  * compaction cascade; the error bound composes additively, so the
  * certificate stays valid under ANY merge tree Spark chooses (merge
  * order is nondeterministic — callers must gate on the certificate,
  * never on sketch CONTENT, exactly like `FreqItems`).
  */
class QuantileSketch(k: Int) extends Aggregator[Double, QSketchState, QSummary] {
  require(k >= 8 && k % 2 == 0, s"capacity must be an even number >= 8, got $k")

  override def zero: QSketchState =
    QSketchState(Vector(Vector.empty), Vector(false), 0L, 0L)

  override def reduce(b: QSketchState, a: Double): QSketchState = {
    val l0 = b.levels.head :+ a
    val st = b.copy(levels = b.levels.updated(0, l0), n = b.n + 1L)
    if (l0.size >= k) compactCascade(st) else st
  }

  override def merge(x: QSketchState, y: QSketchState): QSketchState = {
    val depth = math.max(x.levels.size, y.levels.size)
    def lvl(s: QSketchState, h: Int): Seq[Double] =
      if (h < s.levels.size) s.levels(h) else Vector.empty
    val levels = Vector.tabulate(depth)(h => (lvl(x, h) ++ lvl(y, h)).toVector)
    val parities = Vector.tabulate(depth)(h =>
      (h < x.parities.size && x.parities(h)) ^ (h < y.parities.size && y.parities(h)))
    compactCascade(QSketchState(levels, parities, x.n + y.n, x.err + y.err))
  }

  /** Compact every over-full level, cascading upward. An odd element
    * count leaves the (sorted) maximum in place so compaction always
    * halves an even count — the ≤ 2^h per-compaction error bound needs
    * paired survivors. */
  private def compactCascade(st0: QSketchState): QSketchState = {
    var levels = st0.levels.map(_.toVector).toVector
    var parities = st0.parities.toVector
    var err = st0.err
    var h = 0
    while (h < levels.size) {
      if (levels(h).size >= k) {
        val sorted = levels(h).sorted
        val even = sorted.size - (sorted.size % 2)
        val start = if (parities(h)) 1 else 0
        val survivors = Vector.range(start, even, 2).map(sorted(_))
        val leftover = if (even < sorted.size) Vector(sorted(even)) else Vector.empty[Double]
        levels = levels.updated(h, leftover)
        if (levels.size == h + 1) { levels = levels :+ Vector.empty[Double]; parities = parities :+ false }
        levels = levels.updated(h + 1, levels(h + 1) ++ survivors)
        parities = parities.updated(h, !parities(h))
        err += 1L << h
      }
      h += 1
    }
    st0.copy(levels = levels, parities = parities, err = err)
  }

  override def finish(b: QSketchState): QSummary = {
    val vw = b.levels.zipWithIndex
      .flatMap { case (buf, h) => buf.map(v => (v, 1L << h)) }
      .sortBy(_._1)
    QSummary(vw.map(_._1), vw.map(_._2), b.n, b.err)
  }

  override def bufferEncoder: Encoder[QSketchState] = Encoders.product[QSketchState]
  override def outputEncoder: Encoder[QSummary] = Encoders.product[QSummary]
}
