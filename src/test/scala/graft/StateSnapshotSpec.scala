package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{CorpusMaintenance, SemanticMaintenance}

/** Pointer-consistent snapshots: corpus and cluster map resolved from
  * ONE pointer read, so a cross-surface consumer cannot observe
  * corpus@v+1 joined against map@v across a commit — while the plain
  * accessors keep tracking the live pointer. */
class StateSnapshotSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def freshDir(): String = {
    val p = Files.createTempDirectory("graft_snap")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def docs(lo: Int, hi: Int): DataFrame = {
    val s = spark
    import s.implicits._
    (lo until hi).map(i => (i.toLong, s"snap doc $i word${i % 7} tail")).toDF("doc_id", "text")
  }

  test("snapshot stays on its version across a later ingest; live accessors move") {
    val st = freshDir()
    CorpusMaintenance.bootstrap(spark, docs(0, 10), st)
    val snap = CorpusMaintenance.snapshot(spark, st)
    assert(snap.version === 1)
    assert(snap.corpus.count() === 10)

    CorpusMaintenance.ingestBatch(spark, docs(10, 25), st)
    // the snapshot's surfaces are mutually consistent AND stable
    assert(snap.corpus.count() === 10, "snapshot corpus moved with a later commit")
    assert(snap.clusterMap.join(snap.corpus, Seq("doc_id"), "left_anti").count() === 0,
      "snapshot map references docs outside its own corpus version")
    // live accessors see the new epoch
    assert(CorpusMaintenance.corpus(spark, st).count() === 25)
    val snap2 = CorpusMaintenance.snapshot(spark, st)
    assert(snap2.version === 2)
    assert(snap2.corpus.count() === 25)
  }

  test("semantic snapshot mirrors the corpus one; un-bootstrapped dirs reject") {
    val st = freshDir()
    intercept[IllegalArgumentException] { CorpusMaintenance.snapshot(spark, st) }
    val s = spark
    import s.implicits._
    val vecs = (0 until 10).map { i =>
      (i.toLong, Array.tabulate(64)(j => ((i * 31 + j * 7) % 13 - 6).toDouble))
    }.toDF("vec_id", "v")
    SemanticMaintenance.bootstrap(spark, vecs.filter(col("vec_id") < 6), st,
      threshold = 0.9, bitsPerBand = 4, bands = 8)
    val snap = SemanticMaintenance.snapshot(spark, st)
    assert(snap.version === 1)
    assert(snap.vectors.count() === 6)
    SemanticMaintenance.ingestBatch(spark, vecs.filter(col("vec_id") >= 6), st,
      threshold = 0.9, bitsPerBand = 4, bands = 8)
    assert(snap.vectors.count() === 6, "semantic snapshot moved with a later commit")
    assert(SemanticMaintenance.snapshot(spark, st).vectors.count() === 10)
  }
}
