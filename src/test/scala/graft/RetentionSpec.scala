package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DedupClusters, TextOps}
import graft.streaming.{CorpusMaintenance, Retention, StreamingIvfAppend}

/** The blue/green GC contract: after k ingests + retain(n), exactly the
  * live + n-1 trailing map versions remain, the pointer and the live
  * state are untouched, the maintained map still equals a from-scratch
  * rebuild, and the mtime grace window protects fresh writes. Plus the
  * IVF generation retire path after a compact switch-over. */
class RetentionSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def freshDir(name: String): String = {
    val p = Files.createTempDirectory(s"graft_$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def df(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  private def mapVersionsOnDisk(state: String): Set[Int] =
    new java.io.File(state).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cluster_map_v"))
      .map(_.getName.stripPrefix("cluster_map_v").toInt).toSet

  test("semantic loop: retain sweeps superseded maps, live state and pointer intact") {
    import graft.streaming.SemanticMaintenance
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    def unit(): Seq[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n).toSeq
    }
    val state = freshDir("sem_retain_state")
    val v0 = unit()
    SemanticMaintenance.bootstrap(spark,
      Seq((1L, v0), (2L, unit())).toDF("vec_id", "v"), state,
      threshold = 0.9, bitsPerBand = 4, bands = 32)
    SemanticMaintenance.ingestBatch(spark,
      Seq((11L, unit())).toDF("vec_id", "v"), state,
      threshold = 0.9, bitsPerBand = 4, bands = 32)
    SemanticMaintenance.ingestBatch(spark,
      Seq((12L, v0.map(_ + 0.001))).toDF("vec_id", "v"), state,
      threshold = 0.9, bitsPerBand = 4, bands = 32)
    assert(CorpusMaintenance.currentMapVersion(spark, state) === 3)
    assert(mapVersionsOnDisk(state) === Set(1, 2, 3))

    val deleted = SemanticMaintenance.retain(spark, state, keep = 2, graceMs = 0L)
    assert(deleted.size === 1)
    assert(mapVersionsOnDisk(state) === Set(2, 3))
    assert(CorpusMaintenance.currentMapVersion(spark, state) === 3)
    // 12 ≈ 1 still clustered in the live map after the sweep
    val maintained = SemanticMaintenance.currentMap(spark, state)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(maintained.get(12L) === maintained.get(1L))
    // next ingest commits on the swept store
    SemanticMaintenance.ingestBatch(spark,
      Seq((13L, unit())).toDF("vec_id", "v"), state,
      threshold = 0.9, bitsPerBand = 4, bands = 32)
    assert(CorpusMaintenance.currentMapVersion(spark, state) === 4)
  }

  test("retain(2) after three ingests keeps live + one predecessor; map still == rebuild") {
    val state = freshDir("retain_state")
    CorpusMaintenance.bootstrap(spark, df(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different text about spark engines at scale"))), state)
    CorpusMaintenance.ingestBatch(spark, df(Seq(
      (11L, "the quick brown fox jumps over the lazy doge"))), state)
    CorpusMaintenance.ingestBatch(spark, df(Seq(
      (12L, "completely different text about spark engines at large scale"))), state)
    CorpusMaintenance.ingestBatch(spark, df(Seq(
      (13L, "fresh content entirely new to the landed corpus"))), state)
    assert(CorpusMaintenance.currentMapVersion(spark, state) === 4)
    assert(mapVersionsOnDisk(state) === Set(1, 2, 3, 4))

    // Grace window first: nothing these fresh writes is old enough.
    assert(CorpusMaintenance.retain(spark, state, keep = 2).isEmpty)
    assert(mapVersionsOnDisk(state) === Set(1, 2, 3, 4),
      "the mtime grace window must protect fresh versions")

    // Past the grace window: exactly live + keep-1 survive.
    val deleted = CorpusMaintenance.retain(spark, state, keep = 2, graceMs = 0L)
    assert(deleted.size === 2)
    assert(mapVersionsOnDisk(state) === Set(3, 4))

    // Pointer and live state untouched; maintained map still == rebuild.
    assert(CorpusMaintenance.currentMapVersion(spark, state) === 4)
    val corpus = CorpusMaintenance.corpus(spark, state)
    val maintained = CorpusMaintenance.currentMap(spark, state)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rebuilt = DedupClusters.connectedComponents(
      TextOps.ngramJaccardPairs(corpus, 3, 0.5).select(col("d1"), col("d2")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(maintained === rebuilt, "retention must not disturb the live map")

    // The next ingest keeps committing on top of the swept store.
    val s4 = CorpusMaintenance.ingestBatch(spark, df(Seq(
      (14L, "yet another entirely novel document body here"))), state)
    assert(s4.mapVersion === 5 && mapVersionsOnDisk(state) === Set(3, 4, 5))
  }

  test("streaming sink GCs itself when retainVersions is set") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val state = freshDir("retain_stream"); val ckpt = freshDir("retain_stream_ckpt")
    CorpusMaintenance.bootstrap(spark, df(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different text about spark engines at scale"))), state)

    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stream = ms.toDF().toDF("doc_id", "text")
    val q = CorpusMaintenance.sink(stream, state, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
      retainVersions = Some(2), retainGraceMs = 0L)
    // One micro-batch per document, so each ingest commits its own epoch.
    ms.addData(Seq((11L, "the quick brown fox jumps over the lazy doge")))
    q.processAllAvailable()
    ms.addData(Seq((12L, "yet another entirely novel document body here")))
    q.processAllAvailable()
    ms.addData(Seq((13L, "one more brand new piece of text content again")))
    q.processAllAvailable()
    q.stop()

    assert(CorpusMaintenance.currentMapVersion(spark, state) === 4)
    assert(mapVersionsOnDisk(state) === Set(3, 4),
      "the loop must sweep its own superseded versions")
    assert(CorpusMaintenance.corpus(spark, state).count() === 5)
  }

  test("retire deletes an old IVF generation after compact, never a fresh one") {
    val s = spark
    import s.implicits._
    val base = freshDir("ivf_base"); val delta = freshDir("ivf_delta") + "/d"
    val newBase = freshDir("ivf_base2") + "/b"
    // Tiny deterministic corpus: ids on two well-separated directions.
    val vecs = (0 until 32).map { i =>
      val ang = if (i % 2 == 0) 0.1 * (i % 7) else math.Pi / 2 + 0.1 * (i % 7)
      (i.toLong, Seq(math.cos(ang), math.sin(ang)))
    }
    val vdf = vecs.toDF("vec_id", "v")
    val model = graft.operators.IvfIndex.train(vdf, k = 2, iters = 3)
    graft.operators.IvfIndex.writeIndexed(vdf, model, base)
    // Empty-but-present delta dir (no committed appends) then compact.
    new java.io.File(delta).mkdirs()
    vdf.limit(0).write.mode("overwrite").parquet(delta)
    StreamingIvfAppend.compact(spark, base, delta, newBase, k = 2)
    assert(spark.read.parquet(newBase).count() === 32)

    // Fresh generations are protected by the grace window...
    assert(!Retention.retire(spark, base))
    assert(!Retention.retire(spark, delta))
    // ...and deletable once the caller declares them retired.
    assert(Retention.retire(spark, base, graceMs = 0L))
    assert(Retention.retire(spark, delta, graceMs = 0L))
    assert(!new java.io.File(base).exists() && !new java.io.File(delta).exists())
    assert(!Retention.retire(spark, base, graceMs = 0L), "second retire is a no-op")
    // The new generation still serves searches.
    assert(spark.read.parquet(newBase).count() === 32)
  }
}
