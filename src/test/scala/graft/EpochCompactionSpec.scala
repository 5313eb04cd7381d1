package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DedupClusters, Similarity, TextOps}
import graft.streaming.{CorpusMaintenance, SemanticMaintenance}

/** Epoch compaction for the maintenance stores: folding committed
  * `epoch=N` dirs into one base generation must be INVISIBLE to every
  * reader (maintained ≡ rebuild holds across a mid-history compaction
  * and further ingests), crash-safe (staged base generations are inert
  * until the `_BASE_EPOCH` flip), and must actually shrink the committed
  * listing to O(1) directories once the superseded epochs are retired.
  * Also pins the `_PARAMS` contract: an ingest whose index parameters
  * differ from the bootstrap's is rejected instead of silently mixing
  * incompatible shingle/band keys. */
class EpochCompactionSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def freshDir(name: String): String = {
    val p = Files.createTempDirectory(s"graft_$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def ls(dir: String): Set[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).map(_.getPath.getName).toSet
  }

  // --- text corpus fixtures (CorpusMaintenanceSpec's shapes) -----------
  private val seed = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text about spark engines at scale"),
    (4L, "another unrelated document mentioning parquet files only"))
  private val batch1 = Seq(
    (11L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (12L, "the quick brown fox jumps over the lazy doge"), // near-dup of 1/2
    (13L, "fresh content entirely new to the landed corpus"))
  private val batch2 = Seq(
    (21L, "completely different text about spark engines at large scale"), // near-dup of 3
    (22L, "fresh content entirely new to the landed corpus")) // exact dup of 13

  private def docsDf(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("corpus loop: compact + retire mid-history, maintained == rebuild, listing is O(1)") {
    val state = freshDir("compact_corpus")
    CorpusMaintenance.bootstrap(spark, docsDf(seed), state)
    CorpusMaintenance.ingestBatch(spark, docsDf(batch1), state)

    // Fold epochs 1..2 into one base generation per store, then retire
    // the superseded epoch dirs immediately (graceMs = 0: the test IS
    // the reader, and it re-resolves the pointers below).
    CorpusMaintenance.compactEpochs(spark, state, upTo = 2)
    val retired = CorpusMaintenance.retireCompactedEpochs(spark, state, graceMs = 0)
    assert(retired.exists(_.contains("docs/epoch=1")), s"epoch dirs not retired: $retired")
    assert(ls(s"$state/docs") === Set.empty,
      "all docs epochs were compacted away — the store dir must hold none")
    assert(ls(state).contains("docs_base_v2") && ls(state).contains("shingles_base_v2"))

    // Ingest continues against the compacted store; committed view =
    // base generation + the new epoch only.
    val s2 = CorpusMaintenance.ingestBatch(spark, docsDf(batch2), state)
    assert(s2.nAdmitted === 1 && s2.mapVersion === 3, s"post-compaction ingest: $s2")
    assert(ls(s"$state/docs") === Set("epoch=3"))

    val corpus = CorpusMaintenance.corpus(spark, state)
    assert(corpus.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L, 12L, 13L, 21L))
    val maintained = CorpusMaintenance.currentMap(spark, state)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rebuilt = DedupClusters.connectedComponents(
      TextOps.ngramJaccardPairs(corpus, 3, 0.5).select(col("d1"), col("d2")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(maintained === rebuilt, "maintained map diverged from rebuild after compaction")

    // Exact dedup still sees the compacted hash store: replaying batch1
    // admits nothing.
    val replay = CorpusMaintenance.ingestBatch(spark, docsDf(batch1), state)
    assert(replay.nAdmitted === 0 && replay.mapVersion === 3)
  }

  test("repeated compaction: a second fold reads through the first base generation") {
    val state = freshDir("compact_twice")
    CorpusMaintenance.bootstrap(spark, docsDf(seed), state)
    CorpusMaintenance.ingestBatch(spark, docsDf(batch1), state)
    CorpusMaintenance.compactEpochs(spark, state, upTo = 2)
    CorpusMaintenance.retireCompactedEpochs(spark, state, graceMs = 0)

    // More history lands on top of the compacted base...
    CorpusMaintenance.ingestBatch(spark, docsDf(batch2), state)
    CorpusMaintenance.ingestBatch(spark,
      docsDf(Seq((31L, "yet another brand new document for epoch four"))), state)
    // ...and a SECOND fold must union the live base generation with the
    // epoch tail, supersede base_v2, and keep every reader whole.
    CorpusMaintenance.compactEpochs(spark, state, upTo = 4)
    val retired = CorpusMaintenance.retireCompactedEpochs(spark, state, graceMs = 0)
    assert(retired.exists(_.endsWith("docs_base_v2")), s"old base generation not retired: $retired")
    assert(ls(state).contains("docs_base_v4") && !ls(state).contains("docs_base_v2"))
    assert(ls(s"$state/docs") === Set.empty)

    val corpus = CorpusMaintenance.corpus(spark, state)
    assert(corpus.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L, 12L, 13L, 21L, 31L))
    val maintained = CorpusMaintenance.currentMap(spark, state)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rebuilt = DedupClusters.connectedComponents(
      TextOps.ngramJaccardPairs(corpus, 3, 0.5).select(col("d1"), col("d2")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(maintained === rebuilt, "maintained map diverged after the second compaction")
    // The twice-compacted hash store still blocks replays.
    assert(CorpusMaintenance.ingestBatch(spark, docsDf(batch1), state).nAdmitted === 0)
  }

  test("a crash mid-compact leaves the old epochs live; a rerun overwrites the debris") {
    val state = freshDir("compact_crash")
    CorpusMaintenance.bootstrap(spark, docsDf(seed), state)
    CorpusMaintenance.ingestBatch(spark, docsDf(batch1), state)
    val before = CorpusMaintenance.corpus(spark, state)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // Crash position: a compaction attempt staged a GARBAGE base
    // generation (wrong rows) but died before the _BASE_EPOCH flip.
    docsDf(Seq((99L, "debris from a crashed compaction attempt")))
      .write.mode("overwrite").parquet(s"$state/docs_base_v2")
    assert(CorpusMaintenance.corpus(spark, state)
      .select("doc_id").collect().map(_.getLong(0)).toSet === before,
      "staged-but-uncommitted base generation leaked into the committed view")

    // Rerun: overwrites the debris, then commits. Readers flip over.
    CorpusMaintenance.compactEpochs(spark, state, upTo = 2)
    CorpusMaintenance.retireCompactedEpochs(spark, state, graceMs = 0)
    val after = CorpusMaintenance.corpus(spark, state)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(after === before, "compaction changed the committed corpus")
    assert(!after.contains(99L), "crashed-attempt debris survived the rerun")
  }

  test("re-bootstrapping a compacted state dir restarts from scratch") {
    val state = freshDir("compact_reboot")
    CorpusMaintenance.bootstrap(spark, docsDf(seed), state)
    CorpusMaintenance.ingestBatch(spark, docsDf(batch1), state)
    CorpusMaintenance.compactEpochs(spark, state, upTo = 2)
    // A new pipeline reuses the dir (the rehearsal-tool pattern): the
    // stale _BASE_EPOCH must not make committed reads resolve through
    // the now-dead generation.
    CorpusMaintenance.bootstrap(spark, docsDf(batch2), state)
    assert(graft.streaming.EpochStore.baseEpoch(spark, state) === 0)
    assert(CorpusMaintenance.corpus(spark, state)
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(21L, 22L))
    assert(CorpusMaintenance.ingestBatch(spark, docsDf(seed), state).nAdmitted === 4)
  }

  test("retirement honors the mtime grace window") {
    val state = freshDir("compact_grace")
    CorpusMaintenance.bootstrap(spark, docsDf(seed), state)
    CorpusMaintenance.ingestBatch(spark, docsDf(batch1), state)
    CorpusMaintenance.compactEpochs(spark, state, upTo = 2)
    // Everything was written milliseconds ago: a graced sweep deletes
    // nothing, the committed view still resolves through the base gen.
    val retired = CorpusMaintenance.retireCompactedEpochs(spark, state)
    assert(retired.isEmpty, s"grace window violated: $retired")
    assert(ls(s"$state/docs").contains("epoch=1"))
    assert(CorpusMaintenance.corpus(spark, state).count() === 6)
  }

  test("compact refuses uncommitted epochs and non-advancing folds") {
    val state = freshDir("compact_guard")
    CorpusMaintenance.bootstrap(spark, docsDf(seed), state)
    intercept[IllegalArgumentException] {
      CorpusMaintenance.compactEpochs(spark, state, upTo = 5) // beyond pointer
    }
    CorpusMaintenance.ingestBatch(spark, docsDf(batch1), state)
    CorpusMaintenance.compactEpochs(spark, state, upTo = 2)
    intercept[IllegalArgumentException] {
      CorpusMaintenance.compactEpochs(spark, state, upTo = 2) // does not advance
    }
  }

  test("params pinned at bootstrap: a mismatched ingest is rejected") {
    val state = freshDir("compact_params")
    CorpusMaintenance.bootstrap(spark, docsDf(seed), state, k = 3, threshold = 0.5)
    val e = intercept[IllegalArgumentException] {
      CorpusMaintenance.ingestBatch(spark, docsDf(batch1), state, k = 4, threshold = 0.5)
    }
    assert(e.getMessage.contains("bootstrapped with k=3"), e.getMessage)
    intercept[IllegalArgumentException] {
      CorpusMaintenance.ingestBatch(spark, docsDf(batch1), state, k = 3, threshold = 0.6)
    }
    // The bootstrap values still work.
    assert(CorpusMaintenance.ingestBatch(spark, docsDf(batch1), state).nAdmitted === 2)
  }

  test("self-compacting streaming sink keeps the committed listing bounded") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val state = freshDir("compact_sink"); val ckpt = freshDir("compact_sink_ckpt")
    CorpusMaintenance.bootstrap(spark, docsDf(seed), state)

    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val stream = ms.toDF().toDF("doc_id", "text")
    // Five singleton batches -> epochs 2..6 (one sink restart per batch,
    // so each add lands as its OWN micro-batch and the checkpoint-resume
    // path runs every time); compactEvery=2 folds the tail whenever it
    // reaches two epochs, graceMs=0 retires eagerly.
    (0 until 5).foreach { i =>
      ms.addData(Seq((100L + i, s"unique streaming document number $i")))
      val q = CorpusMaintenance.sink(stream, state, ckpt,
        retainGraceMs = 0, compactEvery = Some(2))
      q.processAllAvailable(); q.stop()
    }

    assert(CorpusMaintenance.currentMapVersion(spark, state) === 6)
    assert(graft.streaming.EpochStore.baseEpoch(spark, state) >= 4,
      "the sink never folded its epoch tail")
    // Committed listing stays O(compactEvery): at most one un-folded
    // epoch dir remains beside the single live base generation.
    assert(ls(s"$state/docs").size <= 1, s"unbounded listing: ${ls(s"$state/docs")}")
    assert(ls(state).count(_.startsWith("docs_base_v")) === 1)

    val corpus = CorpusMaintenance.corpus(spark, state)
    assert(corpus.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L, 100L, 101L, 102L, 103L, 104L))
    val maintained = CorpusMaintenance.currentMap(spark, state)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rebuilt = DedupClusters.connectedComponents(
      TextOps.ngramJaccardPairs(corpus, 3, 0.5).select(col("d1"), col("d2")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(maintained === rebuilt, "self-compacting sink diverged from rebuild")
  }

  // --- semantic loop ---------------------------------------------------
  private val rnd = new scala.util.Random(321)
  private def unit(): Seq[Double] = {
    val v = Array.fill(64)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n).toSeq
  }
  private def perturb(v: Seq[Double]): Seq[Double] = {
    val w = v.map(_ + 0.02 * rnd.nextGaussian())
    val n = math.sqrt(w.map(x => x * x).sum)
    w.map(_ / n)
  }
  private def vecsDf(rows: Seq[(Long, Seq[Double])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "v")
  }

  test("semantic loop: compact + retire mid-history, maintained == rebuild, params pinned") {
    val b0 = unit(); val b3 = unit()
    val seedV = Seq((0L, b0), (1L, perturb(b0)), (2L, unit()), (3L, b3))
    val batchA = Seq((10L, perturb(b0)), (11L, unit()))
    val batchB = Seq((20L, perturb(b3)), (21L, unit()))

    val state = freshDir("compact_sem")
    SemanticMaintenance.bootstrap(spark, vecsDf(seedV), state,
      threshold = 0.9, bitsPerBand = 4, bands = 32)
    SemanticMaintenance.ingestBatch(spark, vecsDf(batchA), state,
      threshold = 0.9, bitsPerBand = 4, bands = 32)

    SemanticMaintenance.compactEpochs(spark, state, upTo = 2)
    val retired = SemanticMaintenance.retireCompactedEpochs(spark, state, graceMs = 0)
    assert(retired.exists(_.contains("keys/epoch=")), s"key epochs not retired: $retired")
    assert(ls(s"$state/vecs") === Set.empty && ls(state).contains("keys_base_v2"))

    // Mismatched band parameters against the compacted index: rejected.
    intercept[IllegalArgumentException] {
      SemanticMaintenance.ingestBatch(spark, vecsDf(batchB), state,
        threshold = 0.9, bitsPerBand = 4, bands = 16)
    }

    SemanticMaintenance.ingestBatch(spark, vecsDf(batchB), state,
      threshold = 0.9, bitsPerBand = 4, bands = 32)
    val landed = SemanticMaintenance.corpus(spark, state)
    assert(landed.select("vec_id").collect().map(_.getLong(0)).toSet ===
      Set(0L, 1L, 2L, 3L, 10L, 11L, 20L, 21L))
    val maintained = SemanticMaintenance.currentMap(spark, state)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rebuilt = DedupClusters.connectedComponents(
      Similarity.embedNearDupLsh(landed, threshold = 0.9, bitsPerBand = 4, bands = 32)
        .select(col("v1").as("d1"), col("v2").as("d2")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(maintained === rebuilt, "semantic maintained map diverged from rebuild after compaction")
    assert(maintained.get(10L) === maintained.get(0L), "post-compaction batch missed the {0,1} cluster")
    assert(maintained.get(20L) === maintained.get(3L), "post-compaction batch missed the {3} cluster")
  }
}
