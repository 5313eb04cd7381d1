package graft

import java.io.PrintWriter
import java.net.ServerSocket
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Direct parity with the reference's demo pipeline (reference
  * OrcSinkTest.java:24-37): socket text source → CSV "x,y" line parse →
  * typed rows — here `readStream.format("socket")` → `from_csv` →
  * memory sink, against a local in-test TCP server (the reference needs
  * a manually-run `nc localhost 9000`; this is the automated form).
  */
class SocketSourceSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  test("socket source -> from_csv parse -> typed rows (reference R1+R2)") {
    val server = new ServerSocket(0) // ephemeral port
    val port = server.getLocalPort
    val lines = Seq("1,10", "2,20", "3,30")
    val writer = new Thread(() => {
      val sock = server.accept()
      val out = new PrintWriter(sock.getOutputStream, true)
      lines.foreach(out.println)
      out.flush()
      // keep the connection open until the test is done reading
      Thread.sleep(20000)
      sock.close()
    })
    writer.setDaemon(true)
    writer.start()

    val schema = StructType(Seq(StructField("x", IntegerType), StructField("y", IntegerType)))
    val sink = "socket_sink"
    val q = spark.readStream
      .format("socket")
      .option("host", "localhost")
      .option("port", port.toString)
      .load()
      .select(from_csv(col("value"), schema, Map.empty[String, String]).as("r"))
      .select(col("r.x"), col("r.y"))
      .writeStream
      .format("memory")
      .queryName(sink)
      .start()
    try {
      var tries = 0
      while (spark.table(sink).count() < 3 && tries < 100) { Thread.sleep(200); tries += 1 }
      val got = spark.table(sink).collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(got === Set((1, 10), (2, 20), (3, 30)), s"socket parse mismatch: $got")
    } finally {
      q.stop()
      server.close()
    }
  }
}
