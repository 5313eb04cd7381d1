package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** STREAMING event-sequence pattern matching — the live twin of the
  * batch `evt_pattern_match` gate and the shape Flink spells as CEP
  * (the reference's own ecosystem primitive): detect "FROM, then
  * anything except TO, then TO" conversion funnels per key AS EVENTS
  * ARRIVE, emitting one row per completed match instead of
  * re-scanning journeys.
  *
  * Equivalence contract (spec-proved against the batch regex): for an
  * in-order per-key symbol stream, this two-state machine — ARM on the
  * first `from`, EMIT + DISARM on the next `to` — produces exactly the
  * batch count of leftmost non-overlapping `from[^to]*to` regex
  * matches. (The regex's `[^to]*` consumes every intervening symbol
  * including repeated `from`s, and scanning resumes after the matched
  * `to` — which is precisely arm-once / emit-once / disarm.)
  *
  * Scale posture: state per key is TWO FIELDS (armed flag + match
  * ordinal) — no journey buffer at all, unlike a batch collect; total
  * state is O(active keys × 16 bytes). Out-of-order arrivals follow
  * the engine-wide streaming contract: order holds within a key's
  * batch (events sort by (ts, event_id) before the fold) and across
  * batches for watermark-ordered feeds; a funnel spanning a batch
  * boundary matches because the ARM survives in state.
  */
object StreamingPatterns {

  case class Ev(key: Long, ts: java.sql.Timestamp, event_id: Long, sym: String)
  case class FunnelMatch(key: Long, match_ordinal: Long, ts: java.sql.Timestamp, event_id: Long)
  case class PatState(armed: Boolean, matches: Long)

  /** Streaming (or batch — same body) funnel matcher over
    * (key, ts, event_id, sym) rows. Emits one row per completed
    * `from … to` funnel with a per-key 1-based ordinal and the
    * completing event's (ts, event_id). */
  def matchFunnel(events: DataFrame, from: String, to: String): Dataset[FunnelMatch] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(
        col("key").cast("long"),
        col("ts").cast("timestamp"),
        col("event_id").cast("long"),
        col("sym").cast("string"))
      .as[Ev]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[Ev],
         state: org.apache.spark.sql.streaming.GroupState[PatState]) =>
          var st = state.getOption.getOrElse(PatState(armed = false, matches = 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelMatch]
          // (ts, event_id) order within the batch → deterministic fold
          rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            if (e.sym == from) {
              if (!st.armed) st = st.copy(armed = true)
            } else if (e.sym == to && st.armed) {
              st = PatState(armed = false, matches = st.matches + 1)
              out += FunnelMatch(key, st.matches, e.ts, e.event_id)
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
