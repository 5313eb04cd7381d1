package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** STREAMING as-of join — the watermarked stream-stream twin of
  * [[graft.operators.AsOfJoin]], closing the last batch-only operator
  * family with a natural streaming spelling.
  *
  * Semantics: for each left event, attach the payload of the LATEST
  * right row with the same key and `rightTime <= leftTime` (backward;
  * `direction = "forward"` mirrors it with the EARLIEST right row at or
  * after). The one semantic delta from the batch operator — inherent to
  * unbounded streams, not an implementation shortcut — is the bounded
  * `lookback`: a streaming join can only hold right-side state for a
  * finite horizon, so matches reach at most `lookback` back (resp.
  * forward). The batch operator under the same bound produces the same
  * rows — StreamingAsOfSpec pins drained ≡ batch, both directions.
  *
  * Shape (all Structured-Streaming-native, state bounded by watermarks):
  *  1. watermark both sides by `delay`;
  *  2. stream-stream INNER join on key equality + the time-RANGE
  *     condition (Spark's interval join — the range is what lets the
  *     engine evict right-side state past the lookback);
  *  3. per left event, reduce the in-window right rows to the as-of row
  *     with `max_by`/`min_by` on the right time — a second stateful
  *     operator (append-mode agg keyed by the left event + an event-time
  *     window), finalized as the watermark passes.
  *
  * Left events with NO right row inside the lookback emit nothing (inner
  * semantics): an outer as-of over streams must wait for the watermark
  * to prove absence, which is exactly Spark's left-outer interval join —
  * compose it upstream if null-payload rows are needed.
  *
  * Scale posture: state is (right rows within lookback per key) + (open
  * left windows), both watermark-evicted; the join shuffles on the key,
  * the reduction on the left event id — the same two exchanges the batch
  * union-and-window pays, with no unbounded growth.
  */
object StreamingAsOf {

  def asOf(
      left: DataFrame,
      leftId: String,
      leftKey: String,
      leftTime: String,
      right: DataFrame,
      rightKey: String,
      rightTime: String,
      rightPayload: Seq[String],
      lookback: String = "1 hour",
      delay: String = "10 seconds",
      direction: String = "backward"
  ): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    val lw = left
      .select(col(leftId).as("__lid"), col(leftKey).as("__lk"), col(leftTime).as("__lt"))
      .withWatermark("__lt", delay)
    val rw = right
      .select((Seq(col(rightKey).as("__rk"), col(rightTime).as("__rt")) ++
        rightPayload.map(col)): _*)
      .withWatermark("__rt", delay)
    val horizon = expr(s"INTERVAL $lookback")
    val range: Column =
      if (direction == "backward")
        col("__rt") <= col("__lt") && col("__rt") >= col("__lt") - horizon
      else
        col("__rt") >= col("__lt") && col("__rt") <= col("__lt") + horizon
    val joined = lw.join(rw, col("__lk") === col("__rk") && range, "inner")
    // the as-of pick: one struct per candidate, reduced by right time;
    // right rows are unique per (key, time) by the operator's contract,
    // so the pick is deterministic
    val cand = struct((col("__rt") +: rightPayload.map(col)): _*)
    val pick =
      if (direction == "backward") max_by(cand, col("__rt")) else min_by(cand, col("__rt"))
    val reduced = joined
      // the window's only job is giving the append-mode agg an
      // event-time key to finalize on; __lid is the real group (unique,
      // so carrying __lt/__lk through max() is value-preserving — they
      // cannot sit in the GROUP BY, where a second event-time column is
      // rejected)
      .groupBy(window(col("__lt"), "1 minute"), col("__lid"))
      .agg(max(col("__lk")).as("__lk"), max(col("__lt")).as("__olt"), pick.as("__pick"))
    reduced.select(
      (Seq(
        col("__lid").as(leftId),
        col("__lk").as(leftKey),
        col("__olt").as(leftTime)) ++
        rightPayload.map(p => col(s"__pick.$p").as(p))): _*)
  }
}
