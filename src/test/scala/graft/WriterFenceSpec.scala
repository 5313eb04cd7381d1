package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{CorpusMaintenance, EpochStore, SemanticMaintenance}

/** Writer fencing for the maintenance state dirs (EpochStore.fence): a
  * second concurrent maintainer must REJECT loudly instead of
  * interleaving pointer flips; a crashed writer's stale lease is taken
  * over after the grace window; the taken-over loop's state still equals
  * a from-scratch rebuild (the fence gates mutation, it never alters
  * what a permitted mutation writes). */
class WriterFenceSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = GraftSession
    .builder(master = "local[4]", shufflePartitions = 4)
    .getOrCreate()

  private def freshDir(): String = {
    val p = Files.createTempDirectory("graft_fence")
    p.toFile.deleteOnExit()
    p.toString
  }

  private def docs(n: Int): DataFrame = {
    val s = spark
    import s.implicits._
    (0 until n).map(i => (i.toLong, s"doc number $i word${i % 7} tail")).toDF("doc_id", "text")
  }

  private def ageLease(stateDir: String, ageMs: Long): Unit = {
    val f = new java.io.File(s"$stateDir/_WRITER_LEASE")
    assert(f.exists(), "lease file missing — fence never acquired")
    assert(f.setLastModified(System.currentTimeMillis() - ageMs))
  }

  test("a second live writer is rejected on ingest, compact, and re-bootstrap") {
    val st = freshDir()
    val d = docs(30)
    CorpusMaintenance.bootstrap(spark, d.filter(col("doc_id") < 10), st, writerId = Some("app-A"))
    CorpusMaintenance.ingestBatch(
      spark, d.filter(col("doc_id").between(10, 19)), st, writerId = Some("app-A"))

    val exIngest = intercept[IllegalStateException] {
      CorpusMaintenance.ingestBatch(
        spark, d.filter(col("doc_id") >= 20), st, writerId = Some("app-B"))
    }
    assert(exIngest.getMessage.contains("leased to writer 'app-A'"))
    intercept[IllegalStateException] {
      CorpusMaintenance.compactEpochs(spark, st, upTo = 2, writerId = Some("app-B"))
    }
    intercept[IllegalStateException] {
      CorpusMaintenance.bootstrap(spark, d, st, writerId = Some("app-B"))
    }
    // the rejected writer changed nothing
    assert(CorpusMaintenance.currentMapVersion(spark, st) == 2)
    assert(CorpusMaintenance.corpus(spark, st).count() == 20)
  }

  test("same writer re-acquires freely (replays, crash recovery)") {
    val st = freshDir()
    val d = docs(20)
    CorpusMaintenance.bootstrap(spark, d.filter(col("doc_id") < 10), st, writerId = Some("app-A"))
    // replay-style pointer reset + re-ingest, all same writer — the gates' path
    CorpusMaintenance.commitPointer(spark, st, 1)
    CorpusMaintenance.ingestBatch(
      spark, d.filter(col("doc_id") >= 10), st, writerId = Some("app-A"))
    assert(CorpusMaintenance.currentMapVersion(spark, st) == 2)
  }

  test("graced takeover of a dead writer's lease; maintained state equals a rebuild") {
    val st = freshDir()
    val d = docs(30)
    CorpusMaintenance.bootstrap(spark, d.filter(col("doc_id") < 10), st, writerId = Some("app-A"))
    CorpusMaintenance.ingestBatch(
      spark, d.filter(col("doc_id").between(10, 19)), st, writerId = Some("app-A"))
    // app-A dies; its lease goes stale past the grace window
    ageLease(st, ageMs = 100000)
    CorpusMaintenance.ingestBatch(
      spark, d.filter(col("doc_id") >= 20), st,
      writerId = Some("app-B"), leaseGraceMs = 50000)
    assert(CorpusMaintenance.currentMapVersion(spark, st) == 3)
    assert(CorpusMaintenance.corpus(spark, st).count() == 30)
    // ... and the lease now fences FOR app-B: the resurrected app-A rejects
    val ex = intercept[IllegalStateException] {
      CorpusMaintenance.ingestBatch(spark, docs(31).filter(col("doc_id") === 30), st,
        writerId = Some("app-A"))
    }
    assert(ex.getMessage.contains("leased to writer 'app-B'"))
    // the taken-over map equals the from-scratch rebuild of the same corpus
    val maintained = CorpusMaintenance.currentMap(spark, st)
      .orderBy(col("doc_id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val rebuilt = graft.operators.DedupClusters.connectedComponents(
        graft.operators.TextOps.ngramJaccardPairs(d, 3, 0.5).select(col("d1"), col("d2")))
      .orderBy(col("doc_id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(maintained.toSeq == rebuilt.toSeq)
  }

  test("release lets a successor in; releasing someone else's lease is a no-op") {
    val st = freshDir()
    val d = docs(20)
    CorpusMaintenance.bootstrap(spark, d.filter(col("doc_id") < 10), st, writerId = Some("app-A"))
    // B cannot release A's lease out from under it
    EpochStore.releaseLease(spark, st, Some("app-B"))
    intercept[IllegalStateException] {
      CorpusMaintenance.ingestBatch(spark, d.filter(col("doc_id") >= 10), st,
        writerId = Some("app-B"))
    }
    // A's clean shutdown releases; B proceeds without waiting out the grace
    EpochStore.releaseLease(spark, st, Some("app-A"))
    CorpusMaintenance.ingestBatch(spark, d.filter(col("doc_id") >= 10), st,
      writerId = Some("app-B"))
    assert(CorpusMaintenance.currentMapVersion(spark, st) == 2)
  }

  test("commit-point re-fence: a fold that lost its lease mid-flight cannot commit") {
    val st = freshDir()
    val d = docs(20)
    CorpusMaintenance.bootstrap(spark, d.filter(col("doc_id") < 10), st, writerId = Some("app-A"))
    CorpusMaintenance.ingestBatch(spark, d.filter(col("doc_id") >= 10), st,
      writerId = Some("app-A"))
    // app-A's lease goes stale; app-B legitimately takes the store over
    // (an empty ingest acquires the lease through the entry fence)
    ageLease(st, ageMs = 100000)
    CorpusMaintenance.ingestBatch(spark, d.filter(col("doc_id") < 0), st,
      writerId = Some("app-B"), leaseGraceMs = 50000)
    // app-A's long-running fold now reaches its COMMIT POINT: the
    // pre-flip re-fence must reject — the staged base generation stays
    // inert debris instead of clobbering app-B's store
    val ex = intercept[IllegalStateException] {
      graft.streaming.EpochStore.compact(
        spark, st, Seq("docs", "hashes", "shingles"), upTo = 2, writerId = Some("app-A"))
    }
    assert(ex.getMessage.contains("leased to writer 'app-B'"))
    assert(graft.streaming.EpochStore.baseEpoch(spark, st) === 0,
      "a fold that lost its lease must not advance the base pointer")
    assert(CorpusMaintenance.corpus(spark, st).count() === 20)
    // and its staging never REACHED a final path: a lost-lease writer's
    // Overwrite output must not clobber the identically-named generation
    // a successor may have committed (writer-unique staging + promote
    // strictly after the re-fence)
    assert(!new java.io.File(s"$st/docs_base_v2").exists(),
      "lost-lease fold's output appeared at the final generation path")
    assert(Option(new java.io.File(st).listFiles()).getOrElse(Array.empty)
      .exists(f => f.getName.startsWith(".staging_")),
      "expected the rejected fold's writer-unique staging debris")
  }

  test("stale-successor ABA: a fold whose successor committed AND then crashed still cannot commit") {
    // The pointer-regression scenario: A loses its lease mid-fold, B
    // takes over and COMMITS a new epoch, then B itself dies and its
    // lease ages past the grace window. A's commit point must STILL
    // reject — a grace-based re-acquire here would promote A's stale
    // staging and move _BASE_EPOCH/_CURRENT_MAP backwards past B's
    // commits. The generation-matched refence (which never takes over)
    // is what closes this.
    val st = freshDir()
    val d = docs(30)
    CorpusMaintenance.bootstrap(spark, d.filter(col("doc_id") < 10), st, writerId = Some("app-A"))
    CorpusMaintenance.ingestBatch(spark, d.filter(col("doc_id").between(10, 19)), st,
      writerId = Some("app-A"))
    // A dies mid-fold; B legitimately takes over and commits epoch 3
    ageLease(st, ageMs = 100000)
    CorpusMaintenance.ingestBatch(spark, d.filter(col("doc_id") >= 20), st,
      writerId = Some("app-B"), leaseGraceMs = 50000)
    assert(CorpusMaintenance.currentMapVersion(spark, st) == 3)
    // ... and B itself now crashes: its lease goes stale too
    ageLease(st, ageMs = 100000)
    // A's zombie fold reaches its commit point with B's lease STALE —
    // the old grace-based re-fence would have passed as a "graced
    // takeover" and regressed the store
    val ex = intercept[IllegalStateException] {
      graft.streaming.EpochStore.compact(
        spark, st, Seq("docs", "hashes", "shingles"), upTo = 2,
        writerId = Some("app-A"), leaseGraceMs = 50000)
    }
    assert(ex.getMessage.contains("leased to writer 'app-B'"), ex.getMessage)
    // nothing regressed: B's commit is intact, no base pointer appeared
    assert(CorpusMaintenance.currentMapVersion(spark, st) == 3)
    assert(graft.streaming.EpochStore.baseEpoch(spark, st) === 0)
    assert(CorpusMaintenance.corpus(spark, st).count() === 30)
    assert(new java.io.File(s"$st/docs/epoch=3").exists(),
      "the successor's committed epoch dir must survive the zombie fold")
  }

  test("semantic loop fences identically") {
    val st = freshDir()
    val s = spark
    import s.implicits._
    val vecs = (0 until 12).map { i =>
      (i.toLong, Array.tabulate(64)(j => ((i * 31 + j * 7) % 13 - 6).toDouble))
    }.toDF("vec_id", "v")
    SemanticMaintenance.bootstrap(spark, vecs.filter(col("vec_id") < 6), st,
      threshold = 0.9, bitsPerBand = 4, bands = 8, writerId = Some("app-A"))
    intercept[IllegalStateException] {
      SemanticMaintenance.ingestBatch(spark, vecs.filter(col("vec_id") >= 6), st,
        threshold = 0.9, bitsPerBand = 4, bands = 8, writerId = Some("app-B"))
    }
    SemanticMaintenance.ingestBatch(spark, vecs.filter(col("vec_id") >= 6), st,
      threshold = 0.9, bitsPerBand = 4, bands = 8, writerId = Some("app-A"))
    assert(CorpusMaintenance.currentMapVersion(spark, st) == 2)
  }
}
