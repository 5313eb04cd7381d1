package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingFunnel

/** Pins batch/streaming symmetry for the funnel operator: aggregating
  * the drained stream's final per-user stage snapshots must reproduce
  * the batch evt_funnel counts exactly, including funnels whose stages
  * straddle micro-batch boundaries (the carried state makes them
  * visible) — plus a synthetic equal-timestamp case where the
  * qualifying click arrives before the view that anchors it.
  */
class StreamingFunnelSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  private def drained(rows: Seq[(Long, Long, String)], chunks: Int, name: String) = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val stream = MemoryStream[(Long, Long, String)]
    val q = StreamingFunnel
      .funnelByUser(stream.toDS())
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    val rnd = new scala.util.Random(7)
    rows.grouped(math.max(1, rows.length / chunks + 1)).foreach { chunk =>
      stream.addData(rnd.shuffle(chunk.toIndexedSeq): _*)
      q.processAllAvailable()
    }
    q.stop()
    // Stage columns only transition null -> value, so MIN per user over
    // all emitted snapshots equals the final state.
    s.table(name)
      .groupBy(col("user_id"))
      .agg(min(col("v")).as("v"), min(col("c")).as("c"), min(col("p")).as("p"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("v")).as("n_view"),
        count(col("c")).as("n_view_click"),
        count(col("p")).as("n_full_funnel"))
      .collect()
      .head
  }

  test("drained stream funnel counts equal the batch funnel") {
    val s = spark
    import s.implicits._
    val rows = Tables
      .events(s, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .collect()
      .sortBy(r => (r._2, r._3))
      .map(r => (r._1, r._2, r._4))
      .toSeq

    val got = drained(rows, chunks = 4, name = "funnel_out")
    val want = SparkEntry.queries("evt_funnel")(s, sf).collect().head
    assert(got.toSeq === want.toSeq, "streamed funnel counts diverge from batch")
    assert(want.getLong(3) > 0, "fixture has no full funnels - symmetry check is weak")
  }

  test("equal-timestamp click before its anchoring view still qualifies") {
    // click@100 arrives before view@100 in (ts, id) order via id; the
    // batch rule min(click ts >= v_ts) counts it. purchase@100 too.
    val rows = Seq[(Long, Long, String)](
      (1L, 100L, "purchase"), (1L, 100L, "click"), (1L, 100L, "view"),
      (2L, 50L, "click"), (2L, 60L, "view"), (2L, 70L, "purchase"))
    val got = drained(rows, chunks = 1, name = "funnel_ties")
    // user 1: full funnel at ts 100; user 2: view only (click precedes
    // view strictly, purchase lacks a click anchor).
    assert(got.toSeq === Seq(2L, 2L, 1L, 1L))
  }
}
