package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sources (SURVEY §2.2 "Socket / rate / file stream source",
  * reference R1). The reference's only source is a raw TCP socket text
  * stream (reference OrcSinkTest.java:32); Spark's equivalents are the
  * socket/rate/file readStream formats. Socket needs a live peer, so the
  * deterministic CI-safe members are exercised: the rate source (R1's
  * "unbounded generator" role) and the file source (the production
  * landing-zone pattern: files appear in a dir, the stream tails it
  * exactly-once via the checkpoint's seen-files log).
  */
class StreamSourcesSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("rate source streams monotonically increasing rows") {
    val sink = "rate_sink"
    val q = spark.readStream
      .format("rate")
      .option("rowsPerSecond", "100")
      .load()
      .writeStream
      .format("memory")
      .queryName(sink)
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      var tries = 0
      while (spark.table(sink).count() < 10 && tries < 100) { Thread.sleep(100); tries += 1 }
      val vals = spark.table(sink).select("value").collect().map(_.getLong(0))
      assert(vals.length >= 10, "rate source produced too few rows")
      assert(vals.distinct.length === vals.length, "rate values must be unique")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains all pending input then stops on its own") {
    // The batch-drain trigger a scheduled ingest job uses: process
    // everything present (respecting maxFilesPerTrigger batching), commit
    // the checkpoint, terminate — no manual stop, no long-lived query.
    val dir = Files.createTempDirectory("graft_availnow").toString
    val ckpt = Files.createTempDirectory("graft_availnow_ckpt").toString
    val out = Files.createTempDirectory("graft_availnow_out").toString
    val d = spark.range(0, 60).withColumn("tag", lit("x"))
    d.coalesce(2).write.mode("append").parquet(dir)
    def drain(): Unit = {
      val q = spark.readStream
        .schema(d.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir)
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(60000), "AvailableNow query did not self-terminate")
    }
    drain()
    assert(spark.read.parquet(out).count() === 60)
    // a second AvailableNow run from the same checkpoint sees nothing new
    drain()
    assert(spark.read.parquet(out).count() === 60, "restart from checkpoint re-processed input")
    // new input lands → a third run picks up exactly the delta
    spark.range(100, 120).withColumn("tag", lit("y")).coalesce(1).write.mode("append").parquet(dir)
    drain()
    val got = spark.read.parquet(out)
    assert(got.count() === 80)
    assert(got.select(countDistinct(col("id"))).head().getLong(0) === 80)
  }

  test("file stream source tails a directory of parquet files exactly once") {
    val dir = Files.createTempDirectory("graft_filesrc").toString
    val sink = "filesrc_sink"
    // Land an initial file before the stream starts, one after.
    val d1 = spark.range(0, 50).withColumn("tag", lit("a"))
    d1.coalesce(1).write.mode("append").parquet(dir)
    val q = spark.readStream
      .schema(d1.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .writeStream
      .format("memory")
      .queryName(sink)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table(sink).count() === 50)
      spark.range(100, 130).withColumn("tag", lit("b")).coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = spark.table(sink)
      assert(got.count() === 80, "second file not picked up (or duplicated)")
      assert(got.select(countDistinct(col("id"))).head().getLong(0) === 80)
    } finally q.stop()
  }
}
