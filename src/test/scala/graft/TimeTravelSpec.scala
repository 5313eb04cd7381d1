package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{CorpusMaintenance, EpochStore, SemanticMaintenance}

/** Time-travel reads + SQL view registration over the maintenance
  * stores: corpus@v stays byte-stable while the loop ingests; the
  * travel horizon is bounded by compaction (folded versions reject
  * loudly) and by the map retention policy; registered views are
  * pointer-consistent and pinned to their snapshot.
  */
class TimeTravelSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def freshDir(): String = {
    val p = Files.createTempDirectory("graft_tt")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def docs(lo: Int, hi: Int): DataFrame = {
    val s = spark
    import s.implicits._
    (lo until hi).map(i => (i.toLong, s"doc number $i word${i % 7} tail")).toDF("doc_id", "text")
  }

  private def ids(df: DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("corpusAt(v) is stable under later ingests; horizon bounded by compaction and retention") {
    val st = freshDir()
    CorpusMaintenance.bootstrap(spark, docs(0, 10), st)
    CorpusMaintenance.ingestBatch(spark, docs(10, 20), st)
    CorpusMaintenance.ingestBatch(spark, docs(20, 30), st)
    assert(CorpusMaintenance.currentMapVersion(spark, st) === 3)

    assert(ids(CorpusMaintenance.corpusAt(spark, st, 1)) === (0L until 10L).toSet)
    assert(ids(CorpusMaintenance.corpusAt(spark, st, 2)) === (0L until 20L).toSet)
    assert(ids(CorpusMaintenance.corpusAt(spark, st, 3)) === (0L until 30L).toSet)
    intercept[IllegalArgumentException] { CorpusMaintenance.corpusAt(spark, st, 4) }
    intercept[IllegalArgumentException] { CorpusMaintenance.corpusAt(spark, st, 0) }

    // older cluster maps travel too, until the retention policy sweeps
    assert(CorpusMaintenance.clusterMapAt(spark, st, 2).columns.toSeq == Seq("doc_id", "rep"))
    CorpusMaintenance.retain(spark, st, keep = 1, graceMs = 0)
    val exMap = intercept[IllegalArgumentException] {
      CorpusMaintenance.clusterMapAt(spark, st, 2)
    }
    assert(exMap.getMessage.contains("retention policy"), exMap.getMessage)

    // compaction bounds the corpus horizon: base=3 folds epochs 1-3 away
    CorpusMaintenance.compactEpochs(spark, st, upTo = 3)
    CorpusMaintenance.retireCompactedEpochs(spark, st, graceMs = 0)
    intercept[EpochStore.StaleViewException] { CorpusMaintenance.corpusAt(spark, st, 2) }
    // ... but the compacted-through version still serves
    assert(ids(CorpusMaintenance.corpusAt(spark, st, 3)) === (0L until 30L).toSet)
  }

  test("registered views are pointer-consistent and pinned to their snapshot") {
    val st = freshDir()
    CorpusMaintenance.bootstrap(spark, docs(0, 10), st)
    CorpusMaintenance.ingestBatch(spark, docs(10, 20), st)
    val served = CorpusMaintenance.registerViews(spark, st, "tt")
    assert(served === 2)
    // a SQL join across the pair runs, and every doc has a map row or none —
    // consistent surfaces from ONE snapshot
    val joined = spark.sql(
      "SELECT COUNT(*) AS n FROM tt_corpus c LEFT JOIN tt_clusters m ON c.doc_id = m.doc_id")
    assert(joined.collect().head.getLong(0) === 20L)
    // later ingests do NOT leak into the registered views (snapshot pinning)
    CorpusMaintenance.ingestBatch(spark, docs(20, 30), st)
    assert(spark.table("tt_corpus").count() === 20L,
      "registered view drifted past its snapshot version")
    // re-registering advances
    assert(CorpusMaintenance.registerViews(spark, st, "tt") === 3)
    assert(spark.table("tt_corpus").count() === 30L)
  }

  test("semantic twin: vectorsAt + registerViews") {
    val st = freshDir()
    val s = spark
    import s.implicits._
    def vecs(lo: Int, hi: Int) = (lo until hi).map { i =>
      (i.toLong, Array.tabulate(64)(j => ((i * 31 + j * 7) % 13 - 6).toDouble))
    }.toDF("vec_id", "v")
    SemanticMaintenance.bootstrap(spark, vecs(0, 8), st,
      threshold = 0.9, bitsPerBand = 4, bands = 8)
    SemanticMaintenance.ingestBatch(spark, vecs(8, 16), st,
      threshold = 0.9, bitsPerBand = 4, bands = 8)
    assert(SemanticMaintenance.vectorsAt(spark, st, 1).count() === 8L)
    assert(SemanticMaintenance.vectorsAt(spark, st, 2).count() === 16L)
    assert(SemanticMaintenance.registerViews(spark, st, "ttv") === 2)
    assert(spark.table("ttv_vectors").count() === 16L)
    assert(spark.table("ttv_clusters").columns.toSeq === Seq("doc_id", "rep"))
  }
}
