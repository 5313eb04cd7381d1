package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Exact per-key running moments for one group key: event count, sum and
  * sum-of-squares of the 1e-3-grid-quantized values. All three are
  * longs, so merging micro-batches is plain integer addition — no
  * float drift, no order dependence. */
case class KeyedMoments(key: Long, n: Long, s: Long, q: Long) {
  /** The batch twin's outlier predicate, verbatim (`evt_anomaly`):
    * (v−mean)² > 4·var with denominators cleared — (n·v_q − s)² >
    * 4·(n·q − s²). The cleared products (n·q, s², d²) exceed int64 after
    * only a few thousand events per key at 1e-3-grid magnitudes, so the
    * comparison runs in BigInt: exact at ANY point in the stream, for
    * any key history whose STORED sums (n, s, q) are themselves in
    * range — and those are guarded by `addExact` in the state
    * transition, so an out-of-range history fails loudly rather than
    * silently wrapping into garbage flags. */
  def isOutlier(vQ: Long): Boolean = {
    val bn = BigInt(n); val bs = BigInt(s)
    val d = bn * BigInt(vQ) - bs
    n >= 10 && d * d > 4 * (bn * BigInt(q) - bs * bs)
  }
}

/** Streaming sibling of the `evt_anomaly` batch query: per-key value
  * moments carried in the state store as exact integers, emitted in
  * Update mode after each micro-batch. Because the state transition is
  * integer addition — the SAME arithmetic the batch query's window
  * aggregation performs — the state after draining a stream equals the
  * batch aggregation over the same rows bit for bit, and the outlier
  * predicate applied to it flags exactly the batch query's rows
  * (StreamingAnomalySpec pins both).
  *
  * Scale posture: O(1) state per key (three longs) regardless of stream
  * length; flooded keys cannot grow state. Idle-key eviction via
  * `timeout` when the key domain is unbounded.
  */
object StreamingAnomaly {

  /** @param events (key, vQ) pairs — vQ already on the caller's integer
    *   grid (e.g. `floor(value*1000 + 0.5)`), matching the batch twin. */
  def runningMomentsByKey(
      events: Dataset[(Long, Long)],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout
  ): Dataset[KeyedMoments] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .mapGroupsWithState[KeyedMoments, KeyedMoments](timeout) {
        (key, batch, state: GroupState[KeyedMoments]) =>
          // addExact/multiplyExact: the stored sums stay provably exact
          // or the job fails loudly — q = Σv² is the first to go (a
          // 1e-3-grid value of 1000 contributes 1e12 per event), and a
          // silently wrapped q would make every later flag garbage.
          val st = batch.foldLeft(state.getOption.getOrElse(KeyedMoments(key, 0L, 0L, 0L))) {
            (m, kv) =>
              val v = kv._2
              KeyedMoments(
                key,
                Math.addExact(m.n, 1L),
                Math.addExact(m.s, v),
                Math.addExact(m.q, Math.multiplyExact(v, v)))
          }
          state.update(st)
          st
      }
  }
}
