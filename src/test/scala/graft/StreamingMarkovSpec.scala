package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingMarkov

/** Pins batch/streaming symmetry for the Markov transition operator:
  * summing the per-batch transition counts a drained stream emits must
  * equal the batch evt_markov query's (from, to, c) counts exactly —
  * INCLUDING transitions that straddle a micro-batch boundary (the
  * carried last-event state is what makes those visible).
  */
class StreamingMarkovSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("drained stream transition counts equal the batch transition matrix") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // Per-user event order = the batch query's (ts, event_id) order;
    // the global sort index doubles as the operator's seq key.
    val rows = Tables
      .events(s, sf)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .as[(Long, String, java.sql.Timestamp, Long)]
      .collect()
      .sortBy(r => (r._3.getTime, r._4))
      .zipWithIndex
      .map { case ((u, t, _, _), i) => (u, i.toLong, t) }

    val stream = MemoryStream[(Long, Long, String)]
    val q = StreamingMarkov
      .transitionsByUser(stream.toDS())
      .writeStream.format("memory").queryName("markov_out").outputMode("update").start()
    // Three micro-batches so cross-batch transitions exist; shuffle
    // each chunk so the in-batch sort (not arrival order) is what
    // the symmetry relies on.
    val rnd = new scala.util.Random(42)
    rows.grouped(math.max(1, rows.length / 3 + 1)).foreach { chunk =>
      stream.addData(rnd.shuffle(chunk.toIndexedSeq): _*)
      q.processAllAvailable()
    }
    q.stop()

    val streamed = s
      .table("markov_out")
      .groupBy(col("from"), col("to"))
      .agg(sum(col("n")).as("c"))
      .as[(String, String, Long)]
      .collect()
      .map(r => (r._1, r._2) -> r._3)
      .toMap

    val batch = SparkEntry
      .queries("evt_markov")(s, sf)
      .select(col("from_type"), col("to_type"), col("c"))
      .as[(String, String, Long)]
      .collect()
      .map(r => (r._1, r._2) -> r._3)
      .toMap

    assert(streamed === batch, "streamed transition counts diverge from batch")
    assert(batch.values.sum > rows.length / 2, "fixture too sparse — symmetry check is weak")
  }
}
