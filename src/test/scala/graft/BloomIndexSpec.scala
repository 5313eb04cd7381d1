package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.FileIO

/** The bloom file-skipping sidecar (`FileIO.buildBloomIndex` /
  * `bloomPointLookup`): no false negatives (every present key found,
  * result ≡ full-scan filter), real pruning (candidate files well below
  * total on scattered keys), absent keys prune to ~zero reads, and the
  * sidecar dir stays invisible to plain table scans. */
class BloomIndexSpec extends AnyFunSuite {
  private lazy val spark =
    GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()

  private def setup(): (String, Int) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bloom_idx").toString + "/t"
    // keys 0..1999 scattered across 16 files by an UNRELATED clustering
    (0L until 2000L)
      .map(k => (k, k % 37, s"v$k"))
      .toDF("k", "grp", "payload")
      .repartition(16, pmod(col("grp"), lit(16)))
      .write
      .parquet(dir)
    val n = FileIO.buildBloomIndex(spark, dir, "k")
    (dir, n)
  }

  test("no false negatives and exact results; present keys prune hard") {
    val (dir, total) = setup()
    // hash partitioning leaves some of the 16 target partitions empty
    // (37 grp values → 16 hash slots); the index covers whatever landed
    assert(total >= 8, s"expected a multi-file layout, got $total files")
    var worst = 0
    (0L until 2000L by 97L).foreach { key =>
      val (rows, cand, tot) = FileIO.bloomPointLookup(spark, dir, "k", key)
      val got = rows.collect()
      assert(got.length === 1, s"key $key not found exactly once")
      assert(got.head.getAs[String]("payload") === s"v$key")
      assert(tot === total)
      worst = math.max(worst, cand)
    }
    // fpp 0.01 over 16 files: expected candidates ≈ 1 + 0.15; a scan
    // that stopped pruning (candidates = 16) is broken
    assert(worst <= 4, s"bloom barely prunes: worst candidate count $worst of $total")
  }

  test("absent key: near-zero candidate files, empty exact result") {
    val (dir, total) = setup()
    val (rows, cand, tot) = FileIO.bloomPointLookup(spark, dir, "k", 999999L)
    assert(rows.count() === 0)
    assert(tot === total)
    assert(cand <= 2, s"absent key should prune to ~0 files, got $cand")
  }

  test("distributed lookup (collectSidecar=false): identical results, identical pruning") {
    val (dir, total) = setup()
    (Seq(0L, 97L, 1999L, 999999L)).foreach { key =>
      val (r1, c1, t1) = FileIO.bloomPointLookup(spark, dir, "k", key)
      val (r2, c2, t2) = FileIO.bloomPointLookup(spark, dir, "k", key, collectSidecar = false)
      assert(r1.collect().toSet === r2.collect().toSet, s"key $key: result mismatch")
      assert(c1 === c2, s"key $key: candidate count mismatch")
      assert(t1 === t2 && t1 === total)
    }
  }

  test("stale sidecar (files appended after indexing) fails loudly instead of mis-pruning") {
    import spark.implicits._
    val (dir, _) = setup()
    // append new files: the sidecar has no blooms for them — a silent
    // lookup would false-negative every appended key
    (10000L until 10100L).map(k => (k, k % 7, s"w$k")).toDF("k", "grp", "payload")
      .coalesce(1).write.mode("append").parquet(dir)
    val ex = intercept[IllegalStateException] {
      FileIO.bloomPointLookup(spark, dir, "k", 10005L)
    }
    assert(ex.getMessage.contains("STALE"), ex.getMessage)
    // rebuild restores service over old AND new files
    FileIO.buildBloomIndex(spark, dir, "k")
    val (rows, _, _) = FileIO.bloomPointLookup(spark, dir, "k", 10005L)
    assert(rows.collect().map(_.getAs[String]("payload")).toSeq === Seq("w10005"))
    val (old, _, _) = FileIO.bloomPointLookup(spark, dir, "k", 5L)
    assert(old.collect().map(_.getAs[String]("payload")).toSeq === Seq("v5"))
  }

  test("edge inputs: empty table indexes to an empty sidecar; null keys are excluded, not NPEs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bloom_edge").toString + "/t"
    // all-null keys: the old implementation NPE'd on max(count)=null /
    // r.getLong on a null cell
    Seq((null.asInstanceOf[java.lang.Long], "a"), (null.asInstanceOf[java.lang.Long], "b"))
      .toDF("k", "payload").write.parquet(dir)
    assert(FileIO.buildBloomIndex(spark, dir, "k") === 0)
    val (rows, cand, _) = FileIO.bloomPointLookup(spark, dir, "k", 1L)
    assert(rows.count() === 0 && cand === 0)
    // mixed null/non-null: nulls dropped from the sketch, non-null keys still found
    val dir2 = java.nio.file.Files.createTempDirectory("bloom_edge2").toString + "/t"
    Seq((java.lang.Long.valueOf(7L), "x"), (null.asInstanceOf[java.lang.Long], "y"))
      .toDF("k", "payload").write.parquet(dir2)
    assert(FileIO.buildBloomIndex(spark, dir2, "k") >= 1)
    val (r2, _, _) = FileIO.bloomPointLookup(spark, dir2, "k", 7L)
    assert(r2.collect().map(_.getAs[String]("payload")).toSeq === Seq("x"))
  }

  test("incremental update: new files sketched, old blooms carried over byte-identical, gone files dropped") {
    import spark.implicits._
    val (dir, total) = setup()
    def sidecarBlooms(): Map[String, Seq[Byte]] =
      FileIO.readBloomSidecar(spark, dir, "k").collect()
        .map(r => r.getAs[String]("file") -> r.getAs[Array[Byte]]("bloom").toSeq).toMap
    val before = sidecarBlooms()
    // append two files of brand-new keys
    (10000L until 10100L).map(k => (k, k % 7, s"w$k")).toDF("k", "grp", "payload")
      .coalesce(2).write.mode("append").parquet(dir)
    val (added, removed) = FileIO.updateBloomIndex(spark, dir, "k")
    assert(added === 2 && removed === 0)
    // old files' bloom bytes must be CARRIED OVER, not recomputed
    val after = sidecarBlooms()
    before.foreach { case (f, b) =>
      assert(after(f) === b, s"bloom for pre-existing $f changed — update rescanned old files")
    }
    assert(after.size === before.size + 2)
    // lookups serve old and new keys through the refreshed sidecar
    val (nw, _, tot2) = FileIO.bloomPointLookup(spark, dir, "k", 10042L)
    assert(nw.collect().map(_.getAs[String]("payload")).toSeq === Seq("w10042"))
    assert(tot2 === total + 2)
    val (old, cand, _) = FileIO.bloomPointLookup(spark, dir, "k", 5L)
    assert(old.count() === 1 && cand <= 4)
    // a vanished file drops out on the next update: delete exactly the
    // file holding key 10042 (deterministic — minBy(name) could pick an
    // EMPTY part file that legitimately never had a sidecar row)
    val victimUri = spark.read.parquet(dir).filter(col("k") === 10042L)
      .select(input_file_name()).head().getString(0)
    val victim = new java.io.File(new java.net.URI(victimUri).getPath)
    assert(victim.delete(), s"could not delete $victim")
    val (a2, r2) = FileIO.updateBloomIndex(spark, dir, "k")
    assert(a2 === 0 && r2 === 1)
    assert(sidecarBlooms().size === after.size - 1)
    val (goneRows, _, _) = FileIO.bloomPointLookup(spark, dir, "k", 10042L)
    assert(goneRows.count() === 0, "a deleted file's keys must vanish from lookups")
    // idempotent no-op when nothing changed
    assert(FileIO.updateBloomIndex(spark, dir, "k") === ((0, 0)))
  }

  test("crash mid-rebuild: staged version debris never serves — the OLD index stays live") {
    import spark.implicits._
    val (dir, total) = setup()
    // simulate a rebuild that crashed AFTER staging its new version dir
    // but BEFORE the pointer flip: plant a v=2 dir with a GARBAGE sidecar
    // (one row claiming a nonexistent file). The commit protocol says it
    // must be invisible: lookups keep serving v=1 exactly.
    Seq(("file:///nonexistent/part-junk.parquet", Array.fill[Byte](16)(0)))
      .toDF("file", "bloom")
      .write.parquet(s"$dir/_bloom_k/v=2")
    val (rows, cand, tot) = FileIO.bloomPointLookup(spark, dir, "k", 5L)
    assert(rows.collect().map(_.getAs[String]("payload")).toSeq === Seq("v5"),
      "staged (uncommitted) sidecar version leaked into lookups")
    assert(tot === total)
    assert(cand <= 4)
    // recovery: the next full rebuild overwrites the debris version and
    // commits past it; lookups serve the rebuilt index
    assert(FileIO.buildBloomIndex(spark, dir, "k") === total)
    val (rows2, _, tot2) = FileIO.bloomPointLookup(spark, dir, "k", 5L)
    assert(rows2.collect().map(_.getAs[String]("payload")).toSeq === Seq("v5"))
    assert(tot2 === total)
    // and the debris dir is now _DEAD-marked for the grace-window sweep
    assert(new java.io.File(s"$dir/_bloom_k/v=1/_DEAD").exists(),
      "superseded version was not marked dead at commit time")
  }

  test("in-place file rewrite (same path, new generation) trips the staleness gate " +
    "and refreshes incrementally") {
    val (dir, total) = setup()
    // touch one data file: same path, new mtime — the generation
    // identity changes even though the LISTING of paths is identical; a
    // path-only fingerprint would silently serve the old blooms (false
    // negatives against rewritten contents)
    val f = new java.io.File(dir).listFiles()
      .filter(x => x.isFile && x.getName.endsWith(".parquet")).head
    assert(f.setLastModified(System.currentTimeMillis() + 4000))
    val ex = intercept[IllegalStateException] {
      FileIO.bloomPointLookup(spark, dir, "k", 5L)
    }
    assert(ex.getMessage.contains("STALE"), ex.getMessage)
    // incremental refresh treats it as gone+fresh: exactly one rescan
    assert(FileIO.updateBloomIndex(spark, dir, "k") === ((1, 1)))
    val (rows, _, tot) = FileIO.bloomPointLookup(spark, dir, "k", 5L)
    assert(rows.collect().map(_.getAs[String]("payload")).toSeq === Seq("v5"))
    assert(tot === total)
  }

  test("sidecar is invisible to plain table scans") {
    val (dir, _) = setup()
    val plain = spark.read.parquet(dir)
    assert(plain.count() === 2000)
    assert(plain.columns.toSet === Set("k", "grp", "payload"),
      "the _bloom_* sidecar leaked into the table scan")
  }
}
