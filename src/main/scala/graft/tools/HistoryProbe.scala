package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.streaming.{Optimize, StreamSinks}

/** Measures the `_PROTECTED` snapshot claim (r17): vacuum's history
  * protection is ONE file read, where the pre-r17 shape re-opened every
  * archived FileStreamSinkLog per sweep — O(versions) log parses on the
  * FREQUENT maintenance path. Builds a table, performs N tiny
  * copy-on-write swaps (N archived versions), then times the protection
  * read with the snapshot present vs the fallback scan (snapshot file
  * removed — exactly the pre-r17 cost):
  *
  *   HISTPROT versions=<N> pinnedFiles=<F> snapshotReadMs=<a> fallbackScanMs=<b>
  *
  * Drive: Test/runMain graft.tools.HistoryProbe [versions] (default 50).
  */
object HistoryProbe {
  def main(args: Array[String]): Unit = {
    val versions = args.headOption.map(_.toInt).getOrElse(50)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val out = Files.createTempDirectory("histprobe_out").toString
    val ckpt = Files.createTempDirectory("histprobe_ckpt").toString
    val stream =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    (0 until 4).foreach { b =>
      stream.addData((0 until 2500).map(i => (b * 2500L + i, i * 1.0)))
      val q = StreamSinks.parquetSink(stream.toDF().toDF("id", "v"), out, ckpt)
      q.processAllAvailable(); q.stop()
    }
    (1 to versions).foreach { i =>
      Optimize.updateWhere(spark, out, col("id") === i.toLong,
        Map("v" -> lit(-i.toDouble))): Unit
    }

    def avgMs(f: => Unit): Double = {
      f // warm
      val n = 5
      val t0 = System.nanoTime()
      (0 until n).foreach(_ => f)
      (System.nanoTime() - t0) / 1e6 / n
    }
    val pin = Optimize.historyPinReport(spark, out)
    val snapMs = avgMs(Optimize.historyPinReport(spark, out): Unit)
    // remove the snapshot: the read falls back to re-opening every
    // archived manifest — the pre-r17 per-sweep cost
    val snap = new java.io.File(out, "_graft_history/_PROTECTED")
    require(snap.delete(), "probe harness: could not remove the snapshot")
    val scanMs = avgMs(Optimize.historyPinReport(spark, out): Unit)
    println(f"HISTPROT versions=${pin.versions} pinnedFiles=${pin.pinnedFiles} " +
      f"snapshotReadMs=$snapMs%.1f fallbackScanMs=$scanMs%.1f")
    spark.stop()
  }
}
