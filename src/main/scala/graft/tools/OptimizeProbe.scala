package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.streaming.{Optimize, StreamSinks}

/** Measures the small-file tax OPTIMIZE exists to pay down, on a real
  * manifest-committed sink table:
  *
  *   OPT batches=<B> rowsPerBatch=<R> filesBefore=<F0> filesAfter=<F1>
  *       scanBeforeMs=<t0> scanAfterMs=<t1> optimizeMs=<to> rows=<n>
  *
  * Drive: Test/runMain graft.tools.OptimizeProbe [batches] [rowsPerBatch]
  * (defaults 48 x 2000). The scan is a full-table aggregate, timed over
  * 3 runs (median), so the delta isolates per-file open/footer/listing
  * cost — the thing that grows O(batches x tasks) on an un-maintained
  * sink and O(data/target) after optimize.
  */
object OptimizeProbe {
  private def timeMs[T](f: => T): (T, Long) = {
    val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1000000)
  }
  private def median3(f: => Unit): Long = {
    val ts = (1 to 3).map(_ => timeMs(f)._2).sorted
    ts(1)
  }

  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(48)
    val rowsPer = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val out = Files.createTempDirectory("optprobe_out").toString
    val ckpt = Files.createTempDirectory("optprobe_ckpt").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Double)]
    (0 until batches).foreach { b =>
      stream.addData((0 until rowsPer).map(i =>
        (b.toLong * rowsPer + i, i.toLong % 7, i * 1.5)))
      val q = StreamSinks.parquetSink(
        stream.toDF().toDF("id", "k", "v"), out, ckpt)
      q.processAllAvailable(); q.stop()
    }

    def scan(): Unit =
      spark.read.parquet(out).agg(count(lit(1)), sum(col("v")), countDistinct(col("k")))
        .collect(): Unit

    val f0 = StreamSinks.committedFiles(spark, out, "parquet").size
    val t0 = median3(scan())
    val (rep, to) = timeMs(Optimize.optimizeSink(
      spark, out, "parquet",
      smallFileBytes = 64L * 1024 * 1024, targetFileBytes = 128L * 1024 * 1024))
    val f1 = StreamSinks.committedFiles(spark, out, "parquet").size
    val t1 = median3(scan())
    val n = spark.read.parquet(out).count()
    println(s"OPT batches=$batches rowsPerBatch=$rowsPer filesBefore=$f0 filesAfter=$f1 " +
      s"scanBeforeMs=$t0 scanAfterMs=$t1 optimizeMs=$to rows=$n " +
      s"compacted=${rep.compactedFiles} kept=${rep.keptFiles}")
    spark.stop()
  }
}
