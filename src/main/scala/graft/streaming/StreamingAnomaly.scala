package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Exact per-key running moments for one group key: event count, sum and
  * sum-of-squares of the 1e-3-grid-quantized values. All three are
  * longs, so merging micro-batches is plain integer addition — no
  * float drift, no order dependence. */
case class KeyedMoments(key: Long, n: Long, s: Long, q: Long) {
  /** The batch twin's outlier predicate, verbatim (`evt_anomaly`):
    * (v−mean)² > 4·var with denominators cleared to pure BIGINT —
    * (n·v_q − s)² > 4·(n·q − s²) — valid at ANY point in the stream. */
  def isOutlier(vQ: Long): Boolean = {
    val d = n * vQ - s
    n >= 10 && d * d > 4 * (n * q - s * s)
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
          val st = batch.foldLeft(state.getOption.getOrElse(KeyedMoments(key, 0L, 0L, 0L))) {
            (m, kv) =>
              val v = kv._2
              KeyedMoments(key, m.n + 1, m.s + v, m.q + v * v)
          }
          state.update(st)
          st
      }
  }
}
