package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingAsOf
import graft.operators.AsOfJoin

/** The streaming as-of twin (StreamingAsOf): drained stream-stream
  * output ≡ the batch AsOfJoin on the same rows under the same bounded
  * lookback, in BOTH directions — the last batch-only operator family's
  * streaming spelling. Also pins the lookback bound itself (a right row
  * just past the horizon must NOT match) and inner semantics (a left
  * event with no in-window right row emits nothing).
  */
class StreamingAsOfSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private val base = 1704067200000L // 2024-01-01 00:00:00 UTC
  private def ts(minute: Double): Timestamp = new Timestamp(base + (minute * 60000L).toLong)

  // (event_id, key, ts): events for keys 1 and 2 across ten minutes
  private val events: Seq[(Long, Long, Timestamp)] = Seq(
    (1L, 1L, ts(1)), (2L, 1L, ts(3)), (3L, 1L, ts(6)), (4L, 1L, ts(9)),
    (5L, 2L, ts(2)), (6L, 2L, ts(5)), (7L, 2L, ts(8)),
    (8L, 3L, ts(4)) // key 3 has no orders at all — must emit nothing
  )
  // (key, o_ts, amount): right side; includes an exact-tie timestamp
  // (key 1 @ minute 3 — backward must take it, >= semantics) and rows
  // spaced so the 2-minute lookback excludes some matches
  private val orders: Seq[(Long, Timestamp, Long)] = Seq(
    (1L, ts(0.5), 100L), (1L, ts(3), 130L), (1L, ts(8.5), 180L),
    (2L, ts(1.5), 215L), (2L, ts(6.5), 265L)
  )

  private def batchEvents: DataFrame = {
    val s = spark; import s.implicits._
    events.toDF("event_id", "key", "ts")
  }
  private def batchOrders: DataFrame = {
    val s = spark; import s.implicits._
    orders.toDF("key", "o_ts", "amount")
  }

  /** The batch reference under the same bounded horizon: AsOfJoin then
    * keep only matches within `lookbackMin` minutes (the streaming twin's
    * inherent state bound) with a real payload. */
  private def batchBounded(direction: String, lookbackMin: Int): Set[(Long, Long, Long)] = {
    val joined =
      if (direction == "backward")
        AsOfJoin.asOf(batchEvents, "key", "ts", batchOrders, "key", "o_ts", Seq("o_ts", "amount"))
          .filter(col("amount").isNotNull &&
            col("o_ts") >= col("ts") - expr(s"INTERVAL ${lookbackMin} minutes"))
      else
        AsOfJoin.asOfForward(batchEvents, "key", "ts", batchOrders, "key", "o_ts", Seq("o_ts", "amount"))
          .filter(col("amount").isNotNull &&
            col("o_ts") <= col("ts") + expr(s"INTERVAL ${lookbackMin} minutes"))
    joined.select("event_id", "key", "amount")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  /** Drive the streaming twin over MemoryStreams and drain it: data, a
    * process pass, then far-future watermark-flush sentinels on BOTH
    * sides (unmatchable key -1, filtered from the results) so the
    * join's and the aggregation's append-mode state finalize. */
  private def drained(direction: String): Set[(Long, Long, Long)] = {
    val s = spark; import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val le = MemoryStream[(Long, Long, Timestamp)]
    val ro = MemoryStream[(Long, Timestamp, Long)]
    val out = StreamingAsOf.asOf(
      le.toDF().toDF("event_id", "key", "ts"), "event_id", "key", "ts",
      ro.toDF().toDF("key", "o_ts", "amount"), "key", "o_ts", Seq("o_ts", "amount"),
      lookback = "2 minutes", delay = "0 seconds", direction = direction)
    val q = out.writeStream
      .format("memory").queryName(s"asof_$direction").outputMode("append").start()
    try {
      le.addData(events: _*); ro.addData(orders: _*)
      q.processAllAvailable()
      // two flush rounds: the watermark computed from batch N's max
      // event time applies from batch N+1, and it must ripple through
      // BOTH stateful operators (join, then agg)
      for (flush <- 1 to 2) {
        le.addData((-flush.toLong, -1L, ts(10000 + flush))); ro.addData((-1L, ts(10000 + flush), -1L))
        q.processAllAvailable()
      }
      spark.table(s"asof_$direction")
        .filter(col("event_id") >= 0)
        .select("event_id", "key", "amount")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    } finally q.stop()
  }

  test("backward: drained stream-stream as-of ≡ batch as-of under the same lookback") {
    val got = drained("backward")
    val want = batchBounded("backward", 2)
    assert(want.nonEmpty && want.exists(_._1 == 2L), "fixture lost the exact-tie case")
    assert(!want.exists(_._1 == 8L), "fixture: key 3 must have no match")
    assert(got === want)
  }

  test("forward: drained stream-stream as-of ≡ batch forward as-of under the same lookback") {
    val got = drained("forward")
    val want = batchBounded("forward", 2)
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("the lookback bound is real: a right row just past the horizon does not match") {
    // event 4 (key 1, minute 9) has its nearest backward order at minute
    // 8.5 — inside 2 minutes — but event 3 (minute 6) only has minute 3,
    // which is 3 minutes back: the bounded twin and the bounded batch
    // reference BOTH drop it, while the unbounded batch op keeps it.
    val unbounded = AsOfJoin
      .asOf(batchEvents, "key", "ts", batchOrders, "key", "o_ts", Seq("o_ts", "amount"))
      .filter(col("amount").isNotNull)
      .select("event_id").as[Long](spark.implicits.newLongEncoder).collect().toSet
    assert(unbounded.contains(3L), "unbounded batch as-of should match event 3")
    assert(!batchBounded("backward", 2).exists(_._1 == 3L),
      "the 2-minute bound should exclude event 3's 3-minute-old order")
  }
}
