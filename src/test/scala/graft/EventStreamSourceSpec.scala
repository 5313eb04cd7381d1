package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.EventStreamSource

/** Pins the Kafka deploy-day packaging (EventStreamSource) without a
  * broker: the wire→table parse transform end-to-end over the file-queue
  * twin, poison-message routing, and — the jar-boundary proof — that
  * [[EventStreamSource.kafka]] reaches Spark's data-source resolution for
  * `kafka` and nothing in OUR glue fails earlier. */
class EventStreamSourceSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def freshDir(name: String): String = {
    val p = Files.createTempDirectory(s"graft_$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def enqueueWire(queue: String, payloads: Seq[String], startOffset: Long): Unit = {
    val s = spark
    import s.implicits._
    payloads.zipWithIndex
      .map { case (j, i) =>
        (Array.empty[Byte], j.getBytes("UTF-8"), "events", 0,
          startOffset + i, Timestamp.valueOf("2024-03-05 00:00:00"))
      }
      .toDF("key", "value", "topic", "partition", "offset", "timestamp")
      .coalesce(1).write.mode("append").parquet(queue)
  }

  test("file-queue twin: JSON wire frames parse to typed events rows; poison routes to dead-letter") {
    val queue = freshDir("evt_queue")
    val goodJson = Seq(
      """{"event_id":1,"ts":"2024-03-05T12:34:56.000Z","user_id":10,"event_type":"click","value":1.5,"props":"{}"}""",
      """{"event_id":2,"ts":"2024-03-05T13:00:00.000Z","user_id":11,"event_type":"view","value":null,"props":"a"}""",
      // Well-formed payload whose event_id is legitimately null: must stay
      // on the clean leg — only PARSE failures are corrupt.
      """{"event_id":null,"ts":"2024-03-05T14:00:00.000Z","user_id":12,"event_type":"view","value":2.0,"props":"b"}"""
    )
    val poison = Seq("""not json at all""")
    enqueueWire(queue, goodJson ++ poison, startOffset = 0L)

    val parsed = EventStreamSource.parseEventJson(
      EventStreamSource.fileQueue(spark, queue, maxFilesPerTrigger = 10))
    assert(parsed.isStreaming, "twin must be a genuine stream, not a batch read")

    val q = parsed.writeStream.format("memory").queryName("evt_parsed")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val all = spark.table("evt_parsed")
    val (good, bad) = EventStreamSource.splitCorrupt(all)

    val goodRows = good.orderBy(col("event_id").asc_nulls_last).collect()
    assert(goodRows.length === 3)
    assert(goodRows(0).getLong(0) === 1L)
    assert(goodRows(0).getTimestamp(1) === Timestamp.valueOf("2024-03-05 12:34:56"))
    assert(goodRows(0).getLong(2) === 10L)
    assert(goodRows(0).getString(3) === "click")
    assert(goodRows(0).getDouble(4) === 1.5)
    assert(goodRows(1).isNullAt(4), "explicit null value survives as NULL")
    assert(goodRows(2).isNullAt(0) && goodRows(2).getLong(2) === 12L,
      "well-formed event with null event_id stays on the clean leg")
    // Clean leg is exactly the events table schema (so everything built
    // on Tables.events runs unchanged on the stream).
    assert(good.schema.fieldNames.toSeq ===
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))

    val badRows = bad.collect()
    assert(badRows.length === 1, "ONLY the true parse failure is dead-lettered")
    assert(badRows(0).getString(0) === "not json at all")
    assert(badRows(0).getLong(3) === 3L, "dead-letter keeps the offset for replay")
  }

  test("parsed stream drives the exactly-once ORC sink with a bucketer expression") {
    val queue = freshDir("evt_queue2"); val out = freshDir("evt_out"); val ckpt = freshDir("evt_ckpt")
    enqueueWire(queue, Seq(
      """{"event_id":3,"ts":"2024-03-06T01:00:00.000Z","user_id":12,"event_type":"click","value":10.0,"props":"{}"}""",
      """{"event_id":4,"ts":"2024-03-06T02:00:00.000Z","user_id":13,"event_type":"view","value":99.0,"props":"{}"}"""
    ), startOffset = 0L)

    val (good, _) = EventStreamSource.splitCorrupt(
      EventStreamSource.parseEventJson(EventStreamSource.fileQueue(spark, queue)))
    val q = graft.streaming.StreamSinks.orcBucketedSink(
      good, out, ckpt,
      bucketExpr = concat(col("event_type"), lit("_"),
        when(col("value") < 50, lit("small")).otherwise(lit("big"))))
    q.processAllAvailable(); q.stop()

    val back = spark.read.orc(out)
    assert(back.count() === 2)
    assert(back.filter(col("bucket") === "view_big").select("event_id")
      .collect().map(_.getLong(0)).toSeq === Seq(4L))
    // The arbitrary-expression bucketer produced real Hive-style dirs.
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.contains("bucket=click_small") && dirs.contains("bucket=view_big"))
  }

  test("kafka() wiring reaches data-source resolution — the jar is the only missing piece") {
    val e = intercept[Exception] {
      EventStreamSource.kafka(spark, "broker:9092", "events")
    }
    val msg = (e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")).toLowerCase
    assert(msg.contains("kafka"),
      s"expected failure AT kafka source lookup, got: ${e.getMessage}")
  }
}
