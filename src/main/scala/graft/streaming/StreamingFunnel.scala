package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One user's funnel progress: first-view / first-qualifying-click /
  * first-qualifying-purchase times (micros; MinValue = unset), plus the
  * max click/purchase time seen so far — carried so an equal-timestamp
  * event that arrives BEFORE the stage it qualifies against is not
  * lost (the batch definition is `min(ts) where ts >= stage_ts`, which
  * includes ties the in-order fold has already passed). O(1) per user.
  */
case class FunnelState(v: Long, c: Long, p: Long, maxClick: Long, maxPurch: Long)

/** A per-user funnel snapshot after a micro-batch (nulls = stage unset). */
case class FunnelRow(user_id: Long, v: Option[Long], c: Option[Long], p: Option[Long])

/** Streaming sibling of the `evt_funnel` batch query: the
  * view→click→purchase stage fold runs in `flatMapGroupsWithState`
  * with O(1) state per user, emitting each touched user's snapshot in
  * Update mode. Stage fields only transition unset→set (events arrive
  * in per-user (ts, id) order), so the drained stream's per-user MIN of
  * each stage column equals the final state, and aggregating those
  * reproduces the batch funnel counts exactly — StreamingFunnelSpec
  * pins it.
  *
  * Equal-timestamp contract (where a naive fold diverges from the
  * batch window spelling): a click at exactly the first-view time, or
  * a purchase at exactly the first-click time, qualifies even if it
  * arrived earlier in fold order. The carried max-click/max-purchase
  * times detect those retroactive ties when the stage anchor lands.
  */
object StreamingFunnel {
  private val Unset = Long.MinValue

  /** @param events (user_id, seq, event_type); seq = event-time micros
    *   (the quantity batch ties are decided on), per-user ordered by
    *   (seq, arrival) within and across batches. */
  def funnelByUser(
      events: Dataset[(Long, Long, String)],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout
  ): Dataset[FunnelRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        org.apache.spark.sql.streaming.OutputMode.Update(), timeout) {
        (user, batch, state: GroupState[FunnelState]) =>
          var s = state.getOption.getOrElse(FunnelState(Unset, Unset, Unset, Unset, Unset))
          // Sort within the batch: the shuffle does not preserve order.
          batch.toArray.sortBy(_._2).foreach { case (_, t, tpe) =>
            tpe match {
              case "view" =>
                if (s.v == Unset) {
                  s = s.copy(v = t)
                  // A click already seen at exactly t qualifies (ts >= v).
                  if (s.c == Unset && s.maxClick == t) s = s.copy(c = t)
                  if (s.c != Unset && s.p == Unset && s.maxPurch == s.c) s = s.copy(p = s.c)
                }
              case "click" =>
                s = s.copy(maxClick = math.max(s.maxClick, t))
                if (s.v != Unset && s.c == Unset && t >= s.v) {
                  s = s.copy(c = t)
                  if (s.p == Unset && s.maxPurch == t) s = s.copy(p = t)
                }
              case "purchase" =>
                s = s.copy(maxPurch = math.max(s.maxPurch, t))
                if (s.c != Unset && s.p == Unset && t >= s.c) s = s.copy(p = t)
              case _ => ()
            }
          }
          state.update(s)
          def opt(x: Long): Option[Long] = if (x == Unset) None else Some(x)
          Iterator.single(FunnelRow(user, opt(s.v), opt(s.c), opt(s.p)))
      }
  }
}
