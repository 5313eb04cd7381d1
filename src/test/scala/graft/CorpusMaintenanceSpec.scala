package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{DedupClusters, TextOps}
import graft.streaming.CorpusMaintenance

/** The continuous-ingest maintenance loop end-to-end: exact dedup vs the
  * store, incremental pair generation, cluster-map augment, blue/green
  * versioning — pinned against a from-scratch rebuild of the same state,
  * plus replay idempotence (the at-least-once → exactly-once argument)
  * and the maintained-map leakproof split. */
class CorpusMaintenanceSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def freshDir(name: String): String = {
    val p = Files.createTempDirectory(s"graft_$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  // Tiny synthetic corpus with exact and near duplicates. Texts are long
  // enough (>= 3 words) to shingle at k=3.
  private def doc(id: Long, text: String) = (id, text)
  private val seed = Seq(
    doc(1, "the quick brown fox jumps over the lazy dog"),
    doc(2, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    doc(3, "completely different text about spark engines at scale"),
    doc(4, "another unrelated document mentioning parquet files only")
  )
  private val batch1 = Seq(
    doc(11, "the quick brown fox jumps over the lazy dog"), // EXACT dup of 1 → dropped
    doc(12, "the quick brown fox jumps over the lazy doge"), // near-dup of 1/2 → joins cluster
    doc(13, "fresh content entirely new to the landed corpus")
  )
  private val batch2 = Seq(
    doc(21, "completely different text about spark engines at large scale"), // near-dup of 3
    doc(22, "fresh content entirely new to the landed corpus") // EXACT dup of 13 → dropped
  )

  private def df(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("ingest loop state == from-scratch rebuild; replay is a no-op; split reads the maintained map") {
    val state = freshDir("corpus_state")
    CorpusMaintenance.bootstrap(spark, df(seed), state)
    assert(CorpusMaintenance.currentMapVersion(spark, state) === 1)

    val s1 = CorpusMaintenance.ingestBatch(spark, df(batch1), state)
    assert(s1.nBatch === 3 && s1.nAdmitted === 2, s"batch1 stats: $s1")
    val s2 = CorpusMaintenance.ingestBatch(spark, df(batch2), state)
    assert(s2.nBatch === 2 && s2.nAdmitted === 1, s"batch2 stats: $s2")
    assert(s2.mapVersion === 3)

    // Corpus = seed + admitted survivors only.
    val corpus = CorpusMaintenance.corpus(spark, state)
    assert(corpus.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L, 12L, 13L, 21L))

    // Maintained map == one-shot CC over the surviving corpus.
    val maintained = CorpusMaintenance.currentMap(spark, state)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rebuilt = DedupClusters.connectedComponents(
      TextOps.ngramJaccardPairs(corpus, 3, 0.5).select(col("d1"), col("d2")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(maintained === rebuilt, "maintained map diverged from scratch rebuild")
    assert(maintained(12L) === 1L, "near-dup of docs 1/2 must join their cluster")
    assert(maintained(21L) === 3L, "near-dup of doc 3 must join its cluster")

    // Replay (at-least-once redelivery): every hash already stored → no
    // admissions, no new version, corpus unchanged.
    val replay = CorpusMaintenance.ingestBatch(spark, df(batch1), state)
    assert(replay.nAdmitted === 0 && replay.mapVersion === 3, s"replay mutated state: $replay")
    assert(CorpusMaintenance.corpus(spark, state).count() === 7)

    // Blue/green: superseded versions still on disk, pointer names v3.
    assert(new java.io.File(s"$state/cluster_map_v1").exists())
    assert(Files.readString(java.nio.file.Paths.get(s"$state/_CURRENT_MAP")).trim === "3")

    // Leakproof split over the maintained map: groups never straddle —
    // every member of a cluster shares its rep's split; summary columns
    // match the batch operator's shape.
    val summary = TextOps.leakproofSplitSummary(corpus, CorpusMaintenance.currentMap(spark, state))
    assert(summary.columns.toSeq === Seq("split", "n_docs", "n_groups", "sum_tokens"))
    assert(summary.agg(sum("n_docs")).first().getLong(0) === 7L)
  }

  test("fixture-scale: three ingest batches over documents == one-shot rebuild") {
    val state = freshDir("corpus_state_fixture")
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    // History: thirds by doc_id mod 3 — seed lands first, two batches follow.
    CorpusMaintenance.bootstrap(spark, docs.filter(col("doc_id") % 3 === 0), state)
    CorpusMaintenance.ingestBatch(spark, docs.filter(col("doc_id") % 3 === 1), state)
    CorpusMaintenance.ingestBatch(spark, docs.filter(col("doc_id") % 3 === 2), state)

    val landed = CorpusMaintenance.corpus(spark, state)
    // Exact dups across batches are dropped by the store, so the landed
    // corpus is the fixture minus later-arriving exact duplicates — and
    // the maintained map must equal a from-scratch CC over exactly the
    // landed corpus.
    val maintained = CorpusMaintenance.currentMap(spark, state)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rebuilt = DedupClusters.connectedComponents(
      TextOps.ngramJaccardPairs(landed, 3, 0.5).select(col("d1"), col("d2")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(maintained === rebuilt,
      s"maintained map diverged from rebuild on the fixture (${maintained.size} vs ${rebuilt.size} rows)")
    assert(landed.count() > 0 && maintained.nonEmpty)
  }

  test("corpus_maintain gate: repeated runs replay the ingest history to the identical map") {
    // The declared query bootstraps once per (application, fixture) and
    // REPLAYS the two-ingest history on every later run by resetting the
    // pointer to epoch 1 (the state machine's own crash-replay path). A
    // second in-app run must land byte-identical cluster summaries —
    // otherwise the bench's warm passes would measure a different
    // computation than the driver's one-shot correctness gate.
    val q = SparkEntry.queries("corpus_maintain")
    val first = q(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val second = q(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(first.nonEmpty)
    assert(first === second, "gate replay diverged from the bootstrap-fresh run")
  }

  test("mid-batch crash: staged epochs are invisible until the pointer flip; redelivery converges") {
    val state = freshDir("corpus_crash")
    CorpusMaintenance.bootstrap(spark, df(seed), state)

    // Crash position A: an attempt died after staging docs for epoch 2
    // but before staging hashes or flipping the pointer. Plant debris.
    df(Seq(doc(99L, "garbage partial row from a crashed attempt")))
      .write.mode("overwrite").parquet(s"$state/docs/epoch=2")
    assert(CorpusMaintenance.corpus(spark, state).count() === 4,
      "staged-but-uncommitted epoch must be invisible to readers")

    // Redelivery of the real batch re-stages epoch 2 over the debris.
    val s1 = CorpusMaintenance.ingestBatch(spark, df(batch1), state)
    assert(s1.nAdmitted === 2 && s1.mapVersion === 2)
    val ids = CorpusMaintenance.corpus(spark, state)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L, 4L, 12L, 13L), s"debris leaked into the corpus: $ids")

    // Crash position B: everything for epoch 2 staged (docs, hashes, map)
    // but the pointer flip never happened. Simulate by reverting the
    // pointer (through the module's own atomic writer, keeping the
    // checksum sidecar consistent); committed state must roll back to
    // epoch 1 wholesale.
    CorpusMaintenance.commitPointer(spark, state, 1)
    assert(CorpusMaintenance.corpus(spark, state).count() === 4)
    assert(CorpusMaintenance.ingestBatch(spark, df(batch1), state).mapVersion === 2,
      "redelivery after a pre-flip crash must recommit the same epoch")

    // Final state identical to a clean run: map == from-scratch rebuild,
    // no duplicate doc_ids, and a further replay is a no-op.
    val corpus = CorpusMaintenance.corpus(spark, state)
    assert(corpus.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L, 12L, 13L))
    val maintained = CorpusMaintenance.currentMap(spark, state)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rebuilt = DedupClusters.connectedComponents(
      TextOps.ngramJaccardPairs(corpus, 3, 0.5).select(col("d1"), col("d2")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(maintained === rebuilt, "post-crash maintained map diverged from rebuild")
    assert(CorpusMaintenance.ingestBatch(spark, df(batch1), state).nAdmitted === 0)
  }

  test("streaming sink drives the same loop through foreachBatch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val state = freshDir("corpus_state_stream"); val ckpt = freshDir("corpus_ckpt")
    CorpusMaintenance.bootstrap(spark, df(seed), state)

    val ms = MemoryStream[(Long, String)]
    val stream = ms.toDF().toDF("doc_id", "text")
    ms.addData(batch1)
    val q = CorpusMaintenance.sink(stream, state, ckpt)
    q.processAllAvailable(); q.stop()

    assert(CorpusMaintenance.corpus(spark, state).count() === 6) // 4 seed + 2 admitted
    val maintained = CorpusMaintenance.currentMap(spark, state)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(maintained(12L) === 1L)
  }
}
