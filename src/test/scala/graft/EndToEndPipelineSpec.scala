package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamSinks

/** The reference's entire production story, composed end-to-end on this
  * engine (reference OrcSinkTest.java:16-40 modernized): CSV text lines
  * stream in → schema parse (`from_csv`, the reference's MapFunction) →
  * event-time watermark → tumbling windowed aggregation → exactly-once
  * partitioned ORC sink with time-bucketed directories → a Hive-style
  * reader sees exactly the committed aggregates, prunable by partition.
  */
class EndToEndPipelineSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("csv stream -> parse -> watermark -> window agg -> partitioned exactly-once ORC") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext

    val out = Files.createTempDirectory("graft_e2e_out").toString
    val ckpt = Files.createTempDirectory("graft_e2e_ckpt").toString

    // Raw text lines "id,epoch_seconds,kind,value" — the reference's
    // socket payload shape (OrcSinkTest.java:24-36).
    val lines = MemoryStream[String]
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("ts_s", LongType),
      StructField("kind", StringType),
      StructField("value", DoubleType)
    ))
    val base = 1704067200L // 2024-01-01 00:00:00 UTC
    def line(id: Long, minute: Int, kind: String, v: Double) =
      s"$id,${base + minute * 60},$kind,$v"

    val parsed = lines
      .toDF()
      .select(from_csv(col("value"), schema, Map.empty[String, String]).as("r"))
      .select(col("r.id"), timestamp_seconds(col("r.ts_s")).as("ts"), col("r.kind"), col("r.value"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("kind"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("w.start").as("ws"), col("kind"), col("n"), col("sum_v"))
    val bucketed = StreamSinks.withTimeBuckets(parsed, "ws")

    val q = StreamSinks.orcSink(bucketed, out, ckpt, Seq("dt", "hr"))
    // Batch 1 fills windows [0,10) and [10,20); batch 2's event at minute
    // 45 pushes the watermark past both.
    lines.addData(line(1, 1, "click", 1.0), line(2, 5, "click", 2.0),
      line(3, 12, "view", 10.0), line(4, 15, "view", 20.0))
    q.processAllAvailable()
    lines.addData(line(5, 45, "click", 99.0))
    q.processAllAvailable()
    q.stop()
    // The closed windows flush in the batch AFTER the watermark advances;
    // restarting from the checkpoint runs that batch (exactly the
    // crash-recovery path a production job takes).
    val q2 = StreamSinks.orcSink(bucketed, out, ckpt, Seq("dt", "hr"))
    q2.processAllAvailable()
    q2.stop()

    val landed = spark.read.orc(out)
    // partition layout: dt=2024-01-01/hr=00 directories
    assert(landed.columns.contains("dt") && landed.columns.contains("hr"))
    val got = landed
      .select(col("ws"), col("kind"), col("n"), col("sum_v"))
      .collect()
      .map(r => (r.getTimestamp(0).toInstant.getEpochSecond, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got === Set(
      (base, "click", 2L, 3.0),
      (base + 600, "view", 2L, 30.0)
    ), s"landed aggregates: $got")

    // reader-side partition pruning over the bucketed layout
    val pruned = spark.read.orc(out).filter(col("dt") === "2024-01-01" && col("hr") === "00")
    assert(pruned.count() === 2)
  }
}
