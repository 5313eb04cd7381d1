package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One user's OPEN session: start/last event-time millis, event count,
  * and the event-type sequence so far (reversed; `len` tracked so the
  * flood cap is O(1) per event, not O(n) List.size walks). */
case class PathSessState(startMs: Long, lastMs: Long, len: Int, types: List[String])

/** A closed session's mined path (emitted exactly once, Append mode). */
case class SessionPathRow(user_id: Long, start_ms: Long, path: String)

/** Streaming sibling of the `evt_top_paths` batch query (session path
  * mining): per-user session-gap state in `flatMapGroupsWithState`,
  * Append mode, event-time timeouts.
  *
  * A session closes two ways, both matching the batch
  * `session_window(ts, gap)` semantics — which MERGES touching windows:
  * an event at exactly lastTs + gap still extends the session, so the
  * split condition is STRICTLY `>` (the spec pins the boundary against
  * the batch engine):
  *  - in-stream: the next event of the same user arrives > gap later —
  *    the closed session emits immediately;
  *  - by watermark: no successor arrives and the event-time watermark
  *    passes lastEvent + gap — the timeout closes and emits it.
  * So the DRAINED stream emits every session exactly once, and the
  * per-(user, path) multiset equals the batch sessionization —
  * StreamingTopPathsSpec pins it (top-N path counts are then a plain
  * aggregation over the emitted rows, exactly as the batch query's
  * second stage).
  *
  * Scale/flood posture: state is one open session per active user —
  * O(len) for the path being built, with `maxPathEvents` capping a
  * single session flooded by one user (beyond the cap further events
  * extend the session's TIMING but not its path; a capped path is
  * marked divergent from batch semantics by construction, which is the
  * documented trade for bounded state). Idle users leave state via the
  * same event-time timeout that emits their last session.
  *
  * Ordering contract (same as the funnel/markov siblings): per-user
  * event-time order within and across micro-batches; within a batch
  * the fold re-sorts on (ts, event_id) because the shuffle does not
  * preserve order.
  */
object StreamingTopPaths {

  /** @param events (user_id, ts, event_id, event_type); the caller must
    *   have a watermark on the ts column (EventTimeTimeout needs it). */
  def sessionPathsByUser(
      events: Dataset[(Long, Timestamp, Long, String)],
      gapMs: Long = 300000L,
      maxPathEvents: Int = 10000
  ): Dataset[SessionPathRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[PathSessState, SessionPathRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, batch, state: GroupState[PathSessState]) =>
          if (state.hasTimedOut) {
            // Watermark passed lastMs + gap with no successor: close.
            val st = state.get
            state.remove()
            Iterator.single(SessionPathRow(user, st.startMs, st.types.reverse.mkString(">")))
          } else {
            var out = List.empty[SessionPathRow]
            var st = state.getOption.orNull
            batch.toArray.sortBy(r => (r._2.getTime, r._3)).foreach { case (_, ts, _, tpe) =>
              val t = ts.getTime
              if (st == null) st = PathSessState(t, t, 1, List(tpe))
              else if (t - st.lastMs > gapMs) {
                out = SessionPathRow(user, st.startMs, st.types.reverse.mkString(">")) :: out
                st = PathSessState(t, t, 1, List(tpe))
              } else if (st.len < maxPathEvents) {
                st = PathSessState(st.startMs, t, st.len + 1, tpe :: st.types)
              } else {
                st = st.copy(lastMs = t) // capped: extend timing, not path
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(st.lastMs + gapMs)
            out.reverse.iterator
          }
      }
  }
}
