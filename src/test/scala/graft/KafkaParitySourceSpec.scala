package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamSinks
import scala.jdk.CollectionConverters._

/** Kafka-parity source semantics, pinned without a Kafka broker.
  *
  * The reference's production entry point is a Kafka consumer whose
  * failure model is offset rewind: on crash the in-flight data is
  * dropped and "the kafka source offset resets to the last checkpoint's
  * offset and re-consumes, creating new files" (reference
  * README.md:19-22). This offline build has no spark-sql-kafka jar, so
  * these tests pin the SEMANTICS against Spark's offset-tracked
  * file-queue source instead: the offsets WAL (`checkpoint/offsets/N`
  * written BEFORE execution), the commit log (`checkpoint/commits/N`
  * written after), batch replay by id, and the manifest sink's
  * idempotent commit are all source-agnostic — swapping in
  * `readStream.format("kafka")` at deploy time changes the offset
  * REPRESENTATION (topic-partition offsets vs file positions), not one
  * line of this protocol.
  */
class KafkaParitySourceSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def freshDir(name: String): String = {
    val p = Files.createTempDirectory(s"graft_$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  /** One enqueue = one file = one source "offset" unit (like one Kafka
    * partition segment); maxFilesPerTrigger=1 makes each file its own
    * micro-batch so the offset log advances in observable steps. */
  private def enqueue(queue: String, ids: Seq[Long]): Unit = {
    val s = spark
    import s.implicits._
    ids.toDF("id").coalesce(1).write.mode("append").parquet(queue)
  }

  private def drainOnce(queue: String, out: String, ckpt: String) = {
    val src = spark.readStream
      .schema(StructType.fromDDL("id LONG"))
      .option("maxFilesPerTrigger", "1")
      .parquet(queue)
    val q = StreamSinks.parquetSink(src, out, ckpt)
    q.processAllAvailable()
    val batches = q.recentProgress.map(_.batchId).toSeq
    q.stop()
    batches
  }

  private def sinkIds(out: String): Seq[Long] = {
    val s = spark
    import s.implicits._
    spark.read.parquet(out).select("id").as[Long].collect().toSeq
  }

  test("queue source resumes from the last committed offset across restarts — no loss, no dup") {
    val queue = freshDir("kq_queue"); val out = freshDir("kq_out"); val ckpt = freshDir("kq_ckpt")
    enqueue(queue, 1L to 3L)
    enqueue(queue, 4L to 6L)
    drainOnce(queue, out, ckpt)
    assert(sinkIds(out).sorted === (1L to 6L))

    // New data lands while the consumer is down; restart picks up ONLY
    // past the committed offset.
    enqueue(queue, 7L to 9L)
    drainOnce(queue, out, ckpt)
    val ids = sinkIds(out)
    assert(ids.sorted === (1L to 9L), "loss or duplication across restart")
    assert(ids.distinct.size === ids.size)

    // And the offset log advanced monotonically, one entry per batch.
    val offsets = Files.list(Paths.get(ckpt, "offsets")).iterator().asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit)).map(_.toLong).toSeq.sorted
    assert(offsets === offsets.indices.map(_.toLong), s"offset WAL has holes: $offsets")
  }

  test("a WAL'd-but-uncommitted batch replays from its logged offsets — the Kafka rewind, exactly-once") {
    val queue = freshDir("kr_queue"); val out = freshDir("kr_out"); val ckpt = freshDir("kr_ckpt")
    enqueue(queue, 1L to 5L)
    enqueue(queue, 6L to 10L)
    drainOnce(queue, out, ckpt)
    assert(sinkIds(out).sorted === (1L to 10L))

    // Simulate the reference's crash window: the batch's offsets are
    // WAL'd and its output is in the sink, but the COMMIT record never
    // landed (reference README.md:19-22 — the rewind case). Deleting
    // the last commits/N entry is exactly that state.
    val commitsDir = Paths.get(ckpt, "commits")
    val lastCommit = Files.list(commitsDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit)).map(_.toLong).max
    Files.delete(commitsDir.resolve(lastCommit.toString))
    // The local ChecksumFileSystem shadows every file with .N.crc; a
    // stale one makes the replayed commit's rename fail as a phantom
    // concurrent writer.
    Files.deleteIfExists(commitsDir.resolve(s".$lastCommit.crc"))

    val replayed = drainOnce(queue, out, ckpt)
    assert(replayed.contains(lastCommit),
      s"restart did not rewind to batch $lastCommit (ran: $replayed)")
    // The replay re-runs the SAME batch id against the manifest sink,
    // whose idempotent commit absorbs it: still exactly once.
    val ids = sinkIds(out)
    assert(ids.sorted === (1L to 10L), "rewound batch duplicated or lost rows")
    assert(ids.distinct.size === ids.size)
  }
}
