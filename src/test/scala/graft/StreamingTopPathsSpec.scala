package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingTopPaths

/** Pins the streaming/batch symmetry of session path mining: draining
  * the real events table through StreamingTopPaths (3 micro-batches +
  * watermark advance) must emit EXACTLY the batch `session_window`
  * sessionization's (user, path) multiset — and therefore reproduce
  * `evt_top_paths`' counts under the same downstream aggregation.
  */
class StreamingTopPathsSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("drained session paths ≡ batch session_window paths; top counts match evt_top_paths") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val rows = Tables
      .events(s, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, Timestamp, Long, String)]
      .collect()
      .sortBy(r => (r._2.getTime, r._3)) // global event-time order → per-user order too
    val maxTs = rows.map(_._2.getTime).max

    val stream = MemoryStream[(Long, Timestamp, Long, String)]
    val input = stream
      .toDS()
      .toDF("user_id", "ts", "event_id", "event_type")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Timestamp, Long, String)]
    val q = StreamingTopPaths
      .sessionPathsByUser(input)
      .writeStream
      .format("memory")
      .queryName("paths")
      .outputMode("append")
      .start()

    rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
      stream.addData(chunk.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    // Two sentinel batches for a phantom user: the first advances the
    // watermark past every session's gap, the second lets the timeouts
    // fire and flush the still-open sessions.
    for (i <- 0 to 1) {
      stream.addData((-1L, new Timestamp(maxTs + 3600000L + i), 0L, "x"))
      q.processAllAvailable()
    }
    q.stop()

    val streamed = s
      .table("paths")
      .filter(col("user_id") >= 0)
      .groupBy(col("user_id"), col("path"))
      .count()
      .as[(Long, String, Long)]
      .collect()
      .toSet

    val batch = Tables
      .events(s, sf)
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(expr(
        "concat_ws('>', transform(array_sort(collect_list(struct(ts, event_id, event_type))), x -> x.event_type))"
      ).as("path"))
      .groupBy(col("user_id"), col("path"))
      .count()
      .as[(Long, String, Long)]
      .collect()
      .toSet

    assert(streamed === batch, "streamed session paths diverge from batch sessionization")
    assert(batch.nonEmpty && batch.exists(_._2.contains(">")),
      "fixture has no multi-event session — the equivalence is vacuous")

    // And the declared query's top-path counts fall out of the same rows.
    val topStream = s
      .table("paths")
      .filter(col("user_id") >= 0)
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(15)
      .as[(String, Long)]
      .collect()
      .toSeq
    val topBatch = SparkEntry
      .queries("evt_top_paths")(s, sf)
      .as[(String, Long)]
      .collect()
      .toSeq
    assert(topStream === topBatch, "top-path counts diverge from evt_top_paths")
  }

  test("exact-gap boundary matches session_window: touching merges, strictly-greater splits") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // Spark's session_window MERGES touching windows: b at exactly
    // a + gap extends a's session; c at b + gap + 1ms starts a new one.
    // This empirically pins the boundary the oracles' island rewrite
    // must spell as `> INTERVAL` (not `>=`) — and the streaming
    // operator's in-stream split as strictly `>`.
    val t0 = 1700000000000L
    val evs = Seq(
      (7L, new Timestamp(t0), 1L, "view"),
      (7L, new Timestamp(t0 + 300000L), 2L, "click"), // touching → merges
      (7L, new Timestamp(t0 + 300000L + 300001L), 3L, "purchase")) // > gap → splits

    val batchPaths = evs
      .toDF("user_id", "ts", "event_id", "event_type")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(expr(
        "concat_ws('>', transform(array_sort(collect_list(struct(ts, event_id, event_type))), x -> x.event_type))"
      ).as("path"))
      .select("path")
      .as[String]
      .collect()
      .sorted
      .toSeq
    assert(batchPaths === Seq("purchase", "view>click"), s"unexpected batch split: $batchPaths")

    val stream = MemoryStream[(Long, Timestamp, Long, String)]
    val input = stream
      .toDS()
      .toDF("user_id", "ts", "event_id", "event_type")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Timestamp, Long, String)]
    val q = StreamingTopPaths
      .sessionPathsByUser(input)
      .writeStream
      .format("memory")
      .queryName("paths_boundary")
      .outputMode("append")
      .start()
    stream.addData(evs: _*)
    q.processAllAvailable()
    for (i <- 0 to 1) {
      stream.addData((-1L, new Timestamp(t0 + 7200000L + i), 0L, "x"))
      q.processAllAvailable()
    }
    q.stop()

    val streamed = s
      .table("paths_boundary")
      .filter(col("user_id") >= 0)
      .select("path")
      .as[String]
      .collect()
      .sorted
      .toSeq
    assert(streamed === batchPaths, "boundary gap split diverges from session_window")
  }
}
