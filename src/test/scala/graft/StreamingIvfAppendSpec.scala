package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IvfIndex
import graft.streaming.StreamingIvfAppend

/** Streaming IVF maintenance: appended vectors become searchable with
  * exactly-once semantics and IDENTICAL results to a batch-built index
  * over the same union — the frozen-codebook contract. */
class StreamingIvfAppendSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def freshDir(name: String): String = {
    val p = Files.createTempDirectory(s"graft_$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  private val dim = 8

  /** Deterministic vector near cluster center (id % 3): basis direction
    * + a small id-dependent perturbation — no RNG, so the spec's
    * expected neighbor structure is a pure function of the ids. */
  private def vec(id: Long): Seq[Double] = {
    val c = (id % 3).toInt
    (0 until dim).map { j =>
      (if (j == c) 1.0 else 0.0) + 0.01 * (((id * 7 + j * 3) % 13).toDouble / 13.0)
    }
  }

  private def corpusDf(ids: Seq[Long]) = {
    val s = spark
    import s.implicits._
    ids.map(i => (i, vec(i))).toDF("vec_id", "v")
  }

  test("append → search parity with a batch-built union index; exactly-once on replay") {
    val s = spark
    import s.implicits._
    val basePath = freshDir("ivf_base"); val deltaPath = freshDir("ivf_delta")
    val ckpt = freshDir("ivf_ckpt"); val unionPath = freshDir("ivf_union")

    val baseIds = (0L until 60L)
    val newIds = (100L until 130L)
    val base = corpusDf(baseIds)
    val model = IvfIndex.train(base, k = 4, iters = 3)
    IvfIndex.writeIndexed(base, model, basePath)

    val probes = corpusDf(Seq(0L, 1L, 2L))
      .select(col("vec_id").as("q_id"), col("v").as("qv"))

    // Empty-but-uninitialized delta: search must work before any append.
    val preAppend = StreamingIvfAppend
      .searchWithDelta(basePath, deltaPath, probes, model, nProbe = 2, topK = 5)
    assert(preAppend.count() === 15, "3 probes × top-5 over base only")

    // Stream-append the new vectors in two micro-batches.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Long, Seq[Double])]
    val stream = ms.toDF().toDF("vec_id", "v")
    def drain(): Unit = {
      val q = StreamingIvfAppend.appendSink(stream, model, deltaPath, ckpt)
      q.processAllAvailable(); q.stop()
    }
    ms.addData(newIds.take(15).map(i => (i, vec(i))))
    drain()
    ms.addData(newIds.drop(15).map(i => (i, vec(i))))
    drain()

    // Delta landed cluster-partitioned (Hive dirs) and committed.
    val clDirs = new java.io.File(deltaPath).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cl=")).toSeq
    assert(clDirs.nonEmpty, "delta must be cl=<k>/ partitioned")
    assert(spark.read.parquet(deltaPath).count() === 30)

    // Parity: identical ranking vs a batch index over base ∪ new with
    // the SAME frozen model — (q_id, rnk, vec_id) row-for-row.
    IvfIndex.writeIndexed(base.unionByName(corpusDf(newIds)), model, unionPath)
    val viaDelta = StreamingIvfAppend
      .searchWithDelta(basePath, deltaPath, probes, model, nProbe = 2, topK = 5)
      .select("q_id", "rnk", "vec_id").orderBy("q_id", "rnk").collect().toSeq
    val viaBatch = IvfIndex
      .searchIndexed(unionPath, probes, model, nProbe = 2, topK = 5)
      .select("q_id", "rnk", "vec_id").orderBy("q_id", "rnk").collect().toSeq
    assert(viaDelta === viaBatch, "maintained index must rank identically to batch rebuild")

    // Appended vectors are actually retrievable: probe id 100's own
    // cluster — its nearest neighbors must include delta ids.
    val probe100 = corpusDf(Seq(100L)).select(col("vec_id").as("q_id"), col("v").as("qv"))
    val nn = StreamingIvfAppend
      .searchWithDelta(basePath, deltaPath, probe100, model, nProbe = 2, topK = 5)
      .select("vec_id").as[Long].collect().toSet
    assert(nn.exists(_ >= 100L), s"appended vectors absent from results: $nn")

    // Exactly-once: restarting the sink with the same checkpoint and no
    // new data must not duplicate (batch replay is manifest-idempotent).
    drain()
    assert(spark.read.parquet(deltaPath).count() === 30, "replay duplicated delta rows")
  }
}
