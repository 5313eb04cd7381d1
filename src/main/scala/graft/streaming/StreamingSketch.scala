package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.functions.{FreqItems, MGState}

/** Per-key sketch state emitted each micro-batch: the Misra-Gries
  * counters and consumed stream length for ONE group key, so callers can
  * apply the n/(c+1) zero-false-negative bound per key. */
case class KeyedFreqSketch(key: String, counters: Map[String, Long], n: Long)

/** Streaming PER-KEY heavy hitters — the `mapGroupsWithState` sibling of
  * the global Complete-mode sketch aggregation (`FreqSketchSpec` pins
  * that one): one bounded Misra-Gries summary per group key, updated
  * with each micro-batch and emitted in Update mode, so downstream sees
  * only changed keys, not a full recomputation.
  *
  * The batch/streaming symmetry is exact: state transitions reuse
  * `FreqItems.zero`/`reduce` verbatim (one code path to trust — the
  * sketch proven mergeable in batch is the sketch carried by the state
  * store), and the standard MG guarantee holds per key at any point in
  * the stream: est ≤ true, true − est ≤ n/(c+1), every value with
  * true count > n/(c+1) present.
  *
  * Scale posture: state per key is O(c) counters regardless of stream
  * length — a flooded key cannot grow its own state, and keys are
  * isolated by the state store, so it cannot evict anyone else's
  * counters either (the spec pins this). Idle keys can be evicted via
  * `timeout` (pair with a real trigger cadence); NoTimeout retains all
  * keys, the right default when the key domain is small (languages,
  * sources, tenants).
  */
object StreamingSketch {

  /** @param events (key, value) pairs, typically from readStream
    * @param c      max counters per key (error bound n_key/(c+1))
    */
  def heavyHittersByKey(
      events: Dataset[(String, String)],
      c: Int,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout
  ): Dataset[KeyedFreqSketch] = {
    import events.sparkSession.implicits._
    val agg = new FreqItems(c)
    events
      .groupByKey(_._1)
      .mapGroupsWithState[MGState, KeyedFreqSketch](timeout) {
        (key, batch, state: GroupState[MGState]) =>
          val st = batch.foldLeft(state.getOption.getOrElse(agg.zero)) {
            (s, kv) => agg.reduce(s, kv._2)
          }
          state.update(st)
          KeyedFreqSketch(key, st.counters, st.n)
      }
  }
}
