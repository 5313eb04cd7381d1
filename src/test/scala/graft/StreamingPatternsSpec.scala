package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingPatterns

/** The streaming funnel matcher (`streaming/StreamingPatterns`): its
  * two-state machine must reproduce the batch `from[^to]*to` regex
  * count EXACTLY on in-order feeds (the evt_pattern_match contract),
  * match funnels that span micro-batch boundaries, and survive a
  * checkpoint restart without double-emitting. */
class StreamingPatternsSpec extends AnyFunSuite {
  private lazy val spark =
    GraftSession.builder(master = "local[2]", shufflePartitions = 2).getOrCreate()

  private def tmp() = java.nio.file.Files.createTempDirectory("pat").toString

  /** Fixture events as (key, ts, event_id, sym), chronological. */
  private def fixture = Tables
    .events(spark, "/root/testdata/sf0.001")
    .select(
      col("user_id").cast("long").as("key"),
      col("ts"),
      col("event_id").cast("long"),
      substring(col("event_type"), 1, 1).as("sym"))

  test("batch-mode machine ≡ batch regex count on the whole fixture") {
    val machine = StreamingPatterns
      .matchFunnel(fixture, "v", "p")
      .groupBy(col("key"))
      .agg(max(col("match_ordinal")).as("n"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val regex = fixture
      .groupBy(col("key"))
      .agg(expr("concat_ws('', transform(array_sort(collect_list(struct(ts, event_id, sym))), s -> s.sym))").as("j"))
      .select(col("key"), regexp_count(col("j"), lit("v[^p]*p")).cast("long").as("n"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(regex.values.sum > 0, "fixture has no funnels at all — vacuous test")
    regex.foreach { case (k, n) =>
      assert(machine.getOrElse(k, 0L) === n, s"user $k: machine vs regex disagree")
    }
    assert(machine.keySet.subsetOf(regex.keySet))
  }

  test("cappedJourneys bounds per-key state: events past the cap are dropped deterministically") {
    import spark.implicits._
    // one user with 10 events; cap 4 keeps the (ts, event_id)-first four
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = (0 until 10)
      .map(i => (7L, new java.sql.Timestamp(base.getTime + i * 1000L), i.toLong,
        if (i < 4) "view" else "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.operators.TimeWindows.cappedJourneys(ev, cap = 4).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_events") === 4L, "n_events must count the CAPPED journey")
    assert(out.head.getAs[String]("j") === "vvvv",
      "the journey must be exactly the first cap events in (ts, event_id) order")
    // no-op when histories fit (the gated regime): cap >> history
    val wide = graft.operators.TimeWindows.cappedJourneys(ev, cap = 512).collect()
    assert(wide.head.getAs[String]("j") === "vvvvpppppp")
    // GATED-PATH COLLECT INVENTORY (the no-unbounded-per-key-collect
    // note): every collect_list/collect_set on a gated path is bounded —
    // evt_pattern_match by MaxJourneyEvents (this test), evt_top_paths
    // per 5-minute-gap session, Dedup minhash lists by m hashes/doc,
    // agg_collect_list/set per TPC-H customer (orders-per-customer is
    // fixed by the data model, independent of SF).
    assert(graft.operators.TimeWindows.MaxJourneyEvents === 512)
  }

  test("streaming: batch-spanning funnels match; drained ≡ batch; restart-safe") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp()
    def ev(id: Long, sym: String) =
      (1L, new java.sql.Timestamp(1700000000000L + id * 1000), id, sym)
    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    def run() = StreamingPatterns
      .matchFunnel(in.toDF().toDF("key", "ts", "event_id", "sym"), "v", "p")
      .writeStream
      .format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // batch 1 ARMS (v, then noise) — no emission yet
    in.addData(ev(1, "v"), ev(2, "c"), ev(3, "e"))
    run().awaitTermination()
    assert(spark.read.parquet(s"$dir/out").count() === 0)
    // batch 2 COMPLETES the spanning funnel, then arms + completes another
    in.addData(ev(4, "p"), ev(5, "v"), ev(6, "p"), ev(7, "p"))
    run().awaitTermination()
    val rows = spark.read.parquet(s"$dir/out")
      .orderBy(col("match_ordinal")).collect()
      .map(r => (r.getAs[Long]("match_ordinal"), r.getAs[Long]("event_id")))
    // two matches: events 1..4 (spanning) and 5..6; event 7's p is unarmed
    assert(rows.toSeq === Seq((1L, 4L), (2L, 6L)))
    // restart with no new data: nothing re-emits
    run().awaitTermination()
    assert(spark.read.parquet(s"$dir/out").count() === 2)
  }
}
