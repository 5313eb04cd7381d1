package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Top-level so Catalyst can build an Encoder without an outer scope. */
case class Ev(id: Long, ts: Timestamp, user: Long, kind: String, value: Double)

/** Streaming semantics (SURVEY §2.2 rows 37-43): event-time watermarks,
  * windowed aggregation in append mode, late-data eviction, streaming
  * dedup (incl. within-watermark), stateful per-key processing
  * (mapGroupsWithState), and stream-static + stream-stream joins — all on
  * MemoryStream micro-batches with controlled event time, the automated
  * form of the reference's socket-driven manual test
  * (reference OrcSinkTest.java:32-37, watermark tracking
  * RowOrcBucketingSink.java:114,319-329).
  */
class StreamingSemanticsSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def ts(min: Int): Timestamp = new Timestamp(1704067200000L + min * 60000L)
  private def ev(id: Long, min: Int, user: Long = 1L, kind: String = "click"): Ev =
    Ev(id, ts(min), user, kind, id.toDouble)

  private var sinkId = 0
  private def nextSink(): String = { sinkId += 1; s"stream_sink_$sinkId" }

  test("watermark drops late rows past the threshold; windows emit on watermark passage (append)") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val stream = MemoryStream[Ev]
    val sink = nextSink()
    val q = stream
      .toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))
      .writeStream
      .format("memory")
      .queryName(sink)
      .outputMode(OutputMode.Append())
      .start()

    // Batch 1: fill window [0,10) and advance event time to min 25 —
    // watermark after this batch = 25 - 10 = 15 ≥ 10, so window [0,10)
    // becomes emittable.
    stream.addData(ev(1, 1), ev(2, 5), ev(3, 25))
    q.processAllAvailable()
    // Batch 2: a late row for the already-closed window [0,10) (event
    // time 6 < watermark 15) must be DROPPED, not re-emitted.
    stream.addData(ev(4, 6))
    q.processAllAvailable()
    // Batch 3: advance far so window [20,30) emits too.
    stream.addData(ev(5, 55))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table(sink).collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    assert(rows(ts(0)) === 2L, s"window [0,10) must hold exactly the 2 on-time rows: $rows")
    assert(rows(ts(20)) === 1L, s"window [20,30): $rows")
    assert(!rows.contains(ts(50)) || rows(ts(50)) == 1L) // [50,60) may emit on stop-flush or not
  }

  test("streaming session_window: gap-merged sessions close and emit on watermark passage") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val stream = MemoryStream[Ev]
    val sink = nextSink()
    val q = stream
      .toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("user"), col("w.start").as("ws"), col("w.end").as("we"), col("n"))
      .writeStream
      .format("memory")
      .queryName(sink)
      .outputMode(OutputMode.Append())
      .start()

    // u1: events at 1 and 4 (gap 5 → ONE session [1, 9)); u2 at 2.
    // Nothing can emit yet (watermark is still behind the session ends).
    stream.addData(ev(1, 1), ev(2, 4), ev(3, 2, user = 2L))
    q.processAllAvailable()
    // advance event time to 30 → watermark 20 > every session end → all
    // sessions close and emit exactly once, gap-merged
    stream.addData(ev(4, 30))
    q.processAllAvailable()
    val rows = s
      .table(sink)
      .select(col("user"), col("n"),
        ((col("we").cast("long") - col("ws").cast("long")) / 60).as("mins"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    q.stop()
    // u1's two events merged into one 8-minute session (1 → 4+5); u2's
    // lone event a 5-minute session
    assert(rows === Set((1L, 2L, 8.0), (2L, 1L, 5.0)), s"got $rows")
  }

  test("streaming dropDuplicates and dropDuplicatesWithinWatermark") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val stream = MemoryStream[Ev]
    val sink = nextSink()
    val q = stream
      .toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("id"))
      .writeStream
      .format("memory")
      .queryName(sink)
      .outputMode(OutputMode.Append())
      .start()
    stream.addData(ev(1, 1), ev(1, 1), ev(2, 2)) // same-batch dups
    q.processAllAvailable()
    stream.addData(ev(1, 3)) // dup within watermark → dropped
    q.processAllAvailable()
    q.stop()
    val ids = spark.table(sink).select("id").collect().map(_.getLong(0)).toSeq.sorted
    assert(ids === Seq(1L, 2L), s"dedup failed: $ids")
  }

  test("mapGroupsWithState: running per-user count across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val stream = MemoryStream[Ev]
    val sink = nextSink()
    val counted = stream
      .toDS()
      .groupByKey(_.user)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        case (user, evs, state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + evs.size
          state.update(total)
          (user, total)
      }
      .toDF("user", "running_n")
    val q = counted.writeStream
      .format("memory")
      .queryName(sink)
      .outputMode(OutputMode.Update())
      .start()
    stream.addData(ev(1, 1, user = 7), ev(2, 2, user = 7), ev(3, 3, user = 8))
    q.processAllAvailable()
    stream.addData(ev(4, 4, user = 7))
    q.processAllAvailable()
    q.stop()
    val last = spark
      .table(sink)
      .groupBy("user")
      .agg(max("running_n").as("n"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(last === Map(7L -> 3L, 8L -> 1L), s"stateful counts wrong: $last")
  }

  test("flatMapGroupsWithState emits zero-or-many rows per group per batch") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val stream = MemoryStream[Ev]
    val sink = nextSink()
    // emit one row per NEW id seen for the user (stateful dedup-report)
    val dedupReport = stream
      .toDS()
      .groupByKey(_.user)
      .flatMapGroupsWithState[Set[Long], (Long, Long)](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout
      ) { case (user, evs, state: GroupState[Set[Long]]) =>
        val seen = state.getOption.getOrElse(Set.empty[Long])
        val fresh = evs.map(_.id).filterNot(seen).toSeq.distinct
        state.update(seen ++ fresh)
        fresh.iterator.map(id => (user, id))
      }
      .toDF("user", "first_seen_id")
    val q = dedupReport.writeStream
      .format("memory")
      .queryName(sink)
      .outputMode(OutputMode.Append())
      .start()
    stream.addData(ev(1, 1, user = 5), ev(1, 2, user = 5), ev(2, 3, user = 5))
    q.processAllAvailable()
    stream.addData(ev(2, 4, user = 5), ev(3, 5, user = 5)) // 2 already seen
    q.processAllAvailable()
    q.stop()
    val got = spark.table(sink).select("first_seen_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(got === Seq(1L, 2L, 3L), s"flatMap state emitted: $got")
  }

  test("complete output mode re-emits the full aggregate each batch") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val stream = MemoryStream[Ev]
    val sink = nextSink()
    val q = stream
      .toDF()
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"))
      .writeStream
      .format("memory")
      .queryName(sink)
      .outputMode(OutputMode.Complete())
      .start()
    stream.addData(ev(1, 1, kind = "a"), ev(2, 2, kind = "b"))
    q.processAllAvailable()
    stream.addData(ev(3, 3, kind = "a"))
    q.processAllAvailable()
    q.stop()
    val m = spark.table(sink).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m === Map("a" -> 2L, "b" -> 1L), s"complete mode snapshot: $m")
  }

  test("foreachBatch lands each micro-batch exactly once with its batchId") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_feb").toString
    val stream = MemoryStream[Ev]
    val q = stream
      .toDF()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId)).write.mode("append").parquet(out)
      }
      .option("checkpointLocation", java.nio.file.Files.createTempDirectory("graft_feb_ck").toString)
      .start()
    stream.addData(ev(1, 1), ev(2, 2))
    q.processAllAvailable()
    stream.addData(ev(3, 3))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(out)
    assert(got.count() === 3)
    assert(got.select(countDistinct(col("batch_id"))).head().getLong(0) === 2)
  }

  test("stream-static join: streaming events enrich against a static dimension") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_key", "segment")
    val stream = MemoryStream[Ev]
    val sink = nextSink()
    val q = stream
      .toDF()
      .join(broadcast(dim), col("user") === col("user_key"), "left")
      .select(col("id"), coalesce(col("segment"), lit("unknown")).as("segment"))
      .writeStream
      .format("memory")
      .queryName(sink)
      .outputMode(OutputMode.Append())
      .start()
    stream.addData(ev(1, 1, user = 1), ev(2, 2, user = 2), ev(3, 3, user = 99))
    q.processAllAvailable()
    q.stop()
    val got = spark.table(sink).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "gold", 2L -> "silver", 3L -> "unknown"))
  }

  test("stream-stream inner join with watermarked time-range condition") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val clicks = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val sink = nextSink()
    val cl = clicks.toDF().select(col("id").as("click_id"), col("user").as("cu"), col("ts").as("cts"))
      .withWatermark("cts", "20 minutes")
    val by = buys.toDF().select(col("id").as("buy_id"), col("user").as("bu"), col("ts").as("bts"))
      .withWatermark("bts", "20 minutes")
    val q = cl
      .join(
        by,
        col("cu") === col("bu") &&
          col("bts") >= col("cts") && col("bts") <= col("cts") + expr("INTERVAL 10 MINUTES")
      )
      .select(col("click_id"), col("buy_id"))
      .writeStream
      .format("memory")
      .queryName(sink)
      .outputMode(OutputMode.Append())
      .start()
    clicks.addData(ev(10, 0, user = 1), ev(11, 30, user = 2))
    buys.addData(ev(20, 5, user = 1), ev(21, 50, user = 2)) // 21 outside 11's 10-min range
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table(sink).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((10L, 20L)), s"stream-stream join pairs: $pairs")
  }
}
