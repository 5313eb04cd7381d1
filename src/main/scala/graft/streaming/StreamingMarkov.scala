package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One user's carried state: the sequence number and type of their
  * latest event. Carrying the seq lets a later batch detect (and skip)
  * an out-of-order straggler instead of fabricating a backwards
  * transition. */
case class LastEvent(lastSeq: Long, lastType: String)

/** A (from → to) transition observed in a micro-batch, with its count. */
case class Transition(from: String, to: String, n: Long)

/** Streaming sibling of the `evt_markov` batch query: per-user event
  * sequences fold through `flatMapGroupsWithState`, carrying ONLY the
  * last (seq, type) per user (O(1) state), and emitting the batch's
  * transition counts in Update mode. Summing the emitted counts over a
  * drained stream reproduces the batch query's transition matrix
  * exactly (StreamingMarkovSpec pins it): the fold is the same
  * "pair each event with its predecessor" the batch lead() window
  * computes, so batch/streaming symmetry is structural, not numeric
  * coincidence.
  *
  * Ordering contract: within a micro-batch each user's events are
  * sorted by the caller-supplied `seq` (the shuffle feeding
  * flatMapGroupsWithState does NOT preserve arrival order, so relying
  * on iterator order would be wrong); across batches seq must be
  * non-decreasing per user — an event older than the carried state is
  * dropped rather than folded backwards.
  *
  * Scale posture: state per user is one (long, string); a user's
  * transitions within a batch collapse to counts before emission, so
  * output is bounded by (users × distinct transitions), not events.
  * The per-group sort buffers one user's single-batch events only.
  */
object StreamingMarkov {

  /** @param events (user_id, seq, event_type); seq orders a user's
    *   events (e.g. event time millis ⊕ tiebreak id). */
  def transitionsByUser(
      events: Dataset[(Long, Long, String)],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout
  ): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState[LastEvent, Transition](
        org.apache.spark.sql.streaming.OutputMode.Update(), timeout) {
        (_, batch, state: GroupState[LastEvent]) =>
          val counts = scala.collection.mutable.Map.empty[(String, String), Long]
          var prev = state.getOption
          batch.toArray.sortBy(_._2).foreach { case (_, seq, t) =>
            if (!prev.exists(_.lastSeq > seq)) {
              prev.foreach { p => counts((p.lastType, t)) = counts.getOrElse((p.lastType, t), 0L) + 1L }
              prev = Some(LastEvent(seq, t))
            }
          }
          prev.foreach(state.update)
          counts.iterator.map { case ((f, t), n) => Transition(f, t, n) }
      }
  }
}
