package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.streaming.{Optimize, StreamSinks}

/** Measures the copy-on-write claim: DELETE cost tracks the AFFECTED
  * bytes, not the table size. For each table size (batches × rowsPerBatch)
  * the delete targets the SAME fixed id slice (one batch's worth), so
  * affected bytes stay constant while the table grows:
  *
  *   DML batches=<B> files=<F> rows=<N> deleteMs=<t> rewritten=<k> kept=<u>
  *
  * Drive: Test/runMain graft.tools.DmlProbe [rowsPerBatch] (default 2000),
  * sweeping batches in {16, 64, 256}.
  */
object DmlProbe {
  def main(args: Array[String]): Unit = {
    val rowsPer = args.headOption.map(_.toInt).getOrElse(2000)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    for (batches <- Seq(16, 64, 256)) {
      val out = Files.createTempDirectory(s"dmlprobe_${batches}_out").toString
      val ckpt = Files.createTempDirectory(s"dmlprobe_${batches}_ckpt").toString
      val stream =
        org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
      (0 until batches).foreach { b =>
        stream.addData((0 until rowsPer).map(i => (b.toLong * rowsPer + i, i * 1.0)))
        val q = StreamSinks.parquetSink(stream.toDF().toDF("id", "v"), out, ckpt)
        q.processAllAvailable(); q.stop()
      }
      val files = StreamSinks.committedFiles(spark, out, "parquet").size
      val rows = spark.read.parquet(out).count()
      val t0 = System.nanoTime()
      // fixed slice: the first batch's ids — constant affected bytes at
      // every table size
      val rep = Optimize.deleteWhere(spark, out, col("id") < rowsPer.toLong)
      val ms = (System.nanoTime() - t0) / 1000000
      println(s"DML batches=$batches files=$files rows=$rows deleteMs=$ms " +
        s"rewritten=${rep.rewrittenFiles} kept=${rep.keptFiles}")
    }
    spark.stop()
  }
}
