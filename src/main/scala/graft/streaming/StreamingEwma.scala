package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.operators.Ewma

/** One key's EWMA state: `s` = the value after all COMPLETED chunks
  * (bounded by the value range, so a Long), `nDone` = events folded
  * into `s`, `buf` = the open partial chunk (≤ ChunkLen values, in
  * event order). O(ChunkLen) per key regardless of stream length. */
case class EwmaChunkState(s: Long, nDone: Long, buf: Vector[Long])

/** A per-key EWMA snapshot after a micro-batch (Update mode re-emits;
  * the latest row per key is the current value). */
case class EwmaRow(user_id: Long, n_events: Long, ewma_q: Long)

/** Streaming sibling of the `evt_ewma` batch query — the
  * mapGroupsWithState fold the batch operator's scaladoc promises. The
  * state transition is the IDENTICAL chunked-renormalization algebra
  * (operators/Ewma.scala): values accumulate in an open chunk buffer;
  * every ChunkLen-th event folds the full chunk into `s` exactly
  * (BigInt inside the transition, Long at rest — the EWMA of bounded
  * values is bounded); the emitted snapshot applies the open partial
  * chunk WITHOUT committing it, which is precisely the batch
  * operator's final partial-chunk transition. So after draining a
  * stream, the last emission per key equals the batch `evt_ewma` row
  * bit for bit — StreamingEwmaSpec pins it on the real events table.
  *
  * Ordering contract (same as the anomaly/funnel/markov siblings):
  * per-key event-time order across micro-batches; within a batch the
  * fold re-sorts on (us, event_id).
  */
object StreamingEwma {

  /** Fold a (completed or partial) chunk into `s`: the exact rational
    * EWMA of the chunk, floored once — Ewma's transition, spelled with
    * the same power tables. */
  private def fold(s: Long, chunk: Seq[Long]): Long =
    if (chunk.isEmpty) s
    else {
      val l = chunk.length
      val b = chunk.iterator.zipWithIndex.foldLeft(BigInt(0)) { case (acc, (x, j0)) =>
        acc + BigInt(x) * Ewma.pow7(l - (j0 + 1)) * Ewma.pow8(j0)
      }
      ((Ewma.pow7(l) * BigInt(s) + b) / Ewma.pow8(l)).toLong
    }

  /** @param events (user_id, us, event_id, x) — x on the caller's
    *   integer grid, matching the batch twin. */
  def ewmaByKey(
      events: Dataset[(Long, Long, Long, Long)],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout
  ): Dataset[EwmaRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_._1)
      .mapGroupsWithState[EwmaChunkState, EwmaRow](timeout) {
        (user, batch, state: GroupState[EwmaChunkState]) =>
          var st = state.getOption.orNull
          batch.toArray.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, x) =>
            if (st == null) st = EwmaChunkState(x, 1L, Vector.empty)
            else {
              val buf = st.buf :+ x
              st =
                if (buf.length == Ewma.ChunkLen)
                  EwmaChunkState(fold(st.s, buf), st.nDone + buf.length, Vector.empty)
                else st.copy(buf = buf)
            }
          }
          state.update(st)
          // Snapshot = commit-free partial-chunk application: exactly
          // the batch operator's final transition.
          EwmaRow(user, st.nDone + st.buf.length, fold(st.s, st.buf))
      }
  }
}
