package graft.streaming

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Shared machinery for the epoch-partitioned maintenance stores
  * ([[CorpusMaintenance]]'s docs/hashes/shingles, [[SemanticMaintenance]]'s
  * vecs/keys): pointer files, the committed read view, persisted index
  * parameters, and EPOCH COMPACTION — the fold that keeps a long-running
  * loop's committed listing at O(1) directories instead of one `epoch=N`
  * dir per ingest forever (the engine's answer to the reference's
  * file-per-checkpoint growth, `RowOrcBucketingSink.java:157-164`, where
  * every checkpoint closes a new file per bucket with nothing ever folding
  * them back together).
  *
  * Layout under `stateDir` (all plain parquet):
  *   <store>/epoch=N/       rows landed by ingest epoch N (Hive layout)
  *   <store>_base_v<B>/     compacted base GENERATION: the union of all
  *                          rows of epochs 1..B, written blue/green — a
  *                          later compaction writes `_base_v<B'>` beside
  *                          it and the old generation is retired by the
  *                          same mtime-graced sweep as cluster maps
  *   _CURRENT_MAP           live ingest epoch / cluster-map version
  *   _BASE_EPOCH            compacted-through pointer B (absent = 0)
  *   _PARAMS                index parameters pinned at bootstrap
  *   _WRITER_LEASE          writer fence: holder id + heartbeat mtime
  *                          (see [[fence]])
  *
  * Committed view of a store = `<store>_base_v<B>` ∪ `epoch=N` for
  * B < N ≤ pointer. Both pointers flip through the same temp-file +
  * atomic-rename protocol, so compaction inherits the loops' crash
  * contract verbatim: the staged `_base_v<B>` directories are invisible
  * until the single `_BASE_EPOCH` flip; a crash anywhere before it
  * leaves the old epoch listing live and the staged generations inert
  * (a rerun overwrites them); after it, the superseded `epoch=N` dirs
  * (N ≤ B) and older base generations are dead and reclaimed by
  * [[retireCompacted]] behind the usual mtime grace window.
  *
  * Single-writer: compaction, like ingest itself, assumes one maintainer
  * per state dir (run it from the same loop, between batches) — and the
  * assumption is ENFORCED, not just documented: every mutator passes
  * [[fence]] first, so a second concurrent maintainer rejects loudly and
  * a crashed writer's lease is taken over after a grace window. Readers
  * are never blocked — they resolve both pointers at scan planning and
  * read only committed directories.
  */
object EpochStore {

  private[streaming] def epochDir(base: String, v: Int) = s"$base/epoch=$v"
  private[streaming] def baseGenDir(stateDir: String, store: String, b: Int) =
    s"$stateDir/${store}_base_v$b"
  private[streaming] def mainPointerPath(stateDir: String) = s"$stateDir/_CURRENT_MAP"
  private[streaming] def basePointerPath(stateDir: String) = s"$stateDir/_BASE_EPOCH"
  private def paramsPath(stateDir: String) = s"$stateDir/_PARAMS"
  private[streaming] def leasePath(stateDir: String) = s"$stateDir/_WRITER_LEASE"

  /** How long a writer's lease outlives its last heartbeat before another
    * maintainer may take the state dir over (a crashed writer leaves its
    * lease behind forever; a live loop refreshes it on every mutation). */
  val DefaultLeaseGraceMs: Long = 10 * 60 * 1000L

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Read a one-line int pointer file; 0 if absent. */
  private[streaming] def readIntPointer(spark: SparkSession, path: String): Int = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) 0
    else {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      s.toInt
    }
  }

  /** Temp file + rename(OVERWRITE) through FileContext: atomic on local
    * and HDFS, never observable half-written. */
  private def writeAtomic(spark: SparkSession, path: String, body: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(path)
    val tmp = new Path(path + ".tmp")
    val fs = dst.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    FileContext.getFileContext(dst.toUri, conf).rename(tmp, dst, Options.Rename.OVERWRITE)
  }

  private def readSmallFile(spark: SparkSession, p: Path): String = {
    val fs = fsOf(spark, p)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** Atomic pointer flip — THE commit point for both ingest epochs and
    * compactions. */
  private[streaming] def commitIntPointer(spark: SparkSession, path: String, v: Int): Unit =
    writeAtomic(spark, path, v.toString)

  /** WRITER FENCING for a maintenance state dir: assert this writer may
    * mutate it, then write/refresh the lease (`_WRITER_LEASE` — writer id
    * as content, last heartbeat as mtime; every mutation of a live loop
    * re-acquires, so the heartbeat rides the ingest cadence for free).
    *
    * A DIFFERENT writer holding a lease younger than `graceMs` means two
    * maintainers are pointed at one state dir — the second REJECTS loudly
    * here instead of interleaving pointer flips and corrupting the store
    * (the reference gets this isolation for free from Flink's
    * subtask-indexed filenames, RowOrcBucketingSink.java:125; a
    * shared-state-dir loop does not). A lease older than the grace window
    * is a crashed writer's: takeover proceeds and the lease flips to the
    * new id.
    *
    * Scope, honestly stated: check-then-rename is not compare-and-swap,
    * so two writers racing within one round-trip can both pass — the
    * fence rejects the OPERATIONAL failure class (double-scheduled loops,
    * a forgotten old deployment), which is what a plain FS without
    * conditional writes can give. The atomic rename still guarantees the
    * lease file itself is never half-written. */
  private[streaming] def fence(
      spark: SparkSession,
      stateDir: String,
      writerId: Option[String] = None,
      graceMs: Long = DefaultLeaseGraceMs
  ): Unit = {
    val id = writerId.getOrElse(spark.sparkContext.applicationId)
    val p = new Path(leasePath(stateDir))
    val fs = fsOf(spark, p)
    if (fs.exists(p)) {
      val held = readSmallFile(spark, p).trim
      if (held != id) {
        val age = System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime
        if (age <= graceMs)
          throw new IllegalStateException(
            s"maintenance state at $stateDir is leased to writer '$held' " +
              s"(heartbeat ${age / 1000}s ago, grace ${graceMs / 1000}s): a second concurrent " +
              s"maintainer '$id' would interleave pointer flips and corrupt the store — " +
              "stop the other loop, or wait out the grace window for a crashed writer")
      }
    }
    writeAtomic(spark, leasePath(stateDir), id)
  }

  /** Drop this writer's lease (clean shutdown of a maintenance loop).
    * No-op when absent or held by someone else — releasing must never
    * fence-break a successor that already took over. */
  def releaseLease(spark: SparkSession, stateDir: String, writerId: Option[String] = None): Unit = {
    val id = writerId.getOrElse(spark.sparkContext.applicationId)
    val p = new Path(leasePath(stateDir))
    val fs = fsOf(spark, p)
    if (fs.exists(p) && readSmallFile(spark, p).trim == id) fs.delete(p, false)
    ()
  }

  /** Compacted-through epoch B; 0 if this state was never compacted. */
  def baseEpoch(spark: SparkSession, stateDir: String): Int =
    readIntPointer(spark, basePointerPath(stateDir))

  /** Remove the base pointer — called by the loops' `bootstrap` so
    * re-bootstrapping a previously-compacted state dir restarts from
    * scratch (pre-compaction semantics: stale epochs > 1 are
    * staged-invisible debris; a stale base pointer would instead make
    * every committed read resolve through a dead generation). Old
    * `<store>_base_v*` dirs become inert debris the next compaction
    * overwrites or supersedes. */
  private[streaming] def clearBasePointer(spark: SparkSession, stateDir: String): Unit = {
    val p = new Path(basePointerPath(stateDir))
    val fs = fsOf(spark, p)
    if (fs.exists(p)) fs.delete(p, false)
    ()
  }

  /** Committed view of a store: epochs ≤ `upTo` only, with everything at
    * or below the compacted base epoch read from the ONE base-generation
    * directory instead of its (possibly already retired) epoch dirs.
    * Staged or crashed-orphan epochs are invisible either way. The
    * per-store directory listing is metadata-scale — post-compaction it
    * is O(1) entries, which is the point.
    *
    * The epoch tail is derived from the POINTERS, not a directory
    * listing: every committed epoch in (B, upTo] must exist on disk
    * (each pointer flip to N follows a successful epoch-N stage, and
    * [[retireCompacted]] only deletes epochs ≤ B), so a missing dir is
    * external deletion or a partial copy — the view FAILS LOUDLY instead
    * of silently shrinking and breaking the maintained ≡ rebuild
    * contract. */
  def committed(spark: SparkSession, stateDir: String, store: String, upTo: Int): DataFrame = {
    val base = s"$stateDir/$store"
    val b = baseEpoch(spark, stateDir)
    if (b == 0) {
      spark.read.parquet(base).filter(col("epoch") <= upTo).drop("epoch")
    } else {
      require(upTo >= b,
        s"committed($store) asked for epochs <= $upTo below the compacted base epoch $b: " +
          "compaction only folds COMMITTED epochs and the pointer never moves backwards " +
          "past it, so this indicates pointer/state corruption (or a gate-style pointer " +
          "reset into a compacted store, which is unsupported)")
      val fs = fsOf(spark, new Path(base))
      val tail = (b + 1 to upTo).map { n =>
        val d = epochDir(base, n)
        require(fs.exists(new Path(d)),
          s"committed($store): epoch dir $d is missing but the pointers commit epochs " +
            s"($b, $upTo] — the store was externally deleted or partially copied; " +
            "refusing to serve a silently-shrunken view")
        d
      }
      val paths = baseGenDir(stateDir, store, b) +: tail
      spark.read.parquet(paths: _*)
    }
  }

  /** Fold committed epochs 1..`upTo` of each store into one base
    * generation. Blue/green: the staged `<store>_base_v<upTo>` dirs are
    * invisible until the single `_BASE_EPOCH` flip; a crash mid-compact
    * leaves the old listing live and a rerun overwrites the debris.
    * Superseded epoch dirs and older base generations stay on disk until
    * [[retireCompacted]] sweeps them. */
  def compact(spark: SparkSession, stateDir: String, stores: Seq[String], upTo: Int): Unit = {
    val live = readIntPointer(spark, mainPointerPath(stateDir))
    val b0 = baseEpoch(spark, stateDir)
    require(upTo <= live, s"compact upTo=$upTo beyond the committed pointer $live")
    require(upTo > b0, s"compact upTo=$upTo does not advance the base epoch $b0")
    stores.foreach { store =>
      committed(spark, stateDir, store, upTo)
        .write.mode(SaveMode.Overwrite)
        .parquet(baseGenDir(stateDir, store, upTo))
    }
    commitIntPointer(spark, basePointerPath(stateDir), upTo)
  }

  /** GC after compaction: delete each store's `epoch=N` dirs with
    * N ≤ the committed base epoch, and base generations older than the
    * live one — both behind the usual mtime grace window (a reader that
    * resolved the pointers just before the flip finishes on what it
    * started with). Returns the deleted paths. */
  def retireCompacted(
      spark: SparkSession,
      stateDir: String,
      stores: Seq[String],
      graceMs: Long = 10 * 60 * 1000L
  ): Seq[String] = {
    val b = baseEpoch(spark, stateDir)
    if (b == 0) Seq.empty
    else
      stores.flatMap { store =>
        Retention.retainEpochs(spark, s"$stateDir/$store", cut = b, graceMs = graceMs) ++
          Retention.retainVersioned(
            spark, stateDir, s"${store}_base_v", live = b, keep = 1, graceMs = graceMs)
      }
  }

  /** Pin the loop's index parameters at bootstrap. The stored epochs are
    * only mutually consistent under ONE parameter set (band keys under
    * one (bitsPerBand, bands), shingles under one k), so ingests must
    * never mix: [[requireParams]] rejects a mismatched caller instead of
    * silently corrupting candidate generation. */
  private[streaming] def writeParams(
      spark: SparkSession, stateDir: String, params: Seq[(String, String)]): Unit =
    writeAtomic(spark, paramsPath(stateDir),
      params.map { case (k, v) => s"$k=$v" }.mkString("\n"))

  /** Assert a caller's parameters against the pinned `_PARAMS`. A state
    * dir without the file (written by a pre-metadata version) is
    * accepted as-is — the caller owns consistency there, as before. */
  private[streaming] def requireParams(
      spark: SparkSession, stateDir: String, params: Seq[(String, String)]): Unit = {
    val p = new Path(paramsPath(stateDir))
    val fs = fsOf(spark, p)
    if (fs.exists(p)) {
      val body = readSmallFile(spark, p)
      val stored = body.split("\n").toSeq
        .map(_.trim).filter(_.nonEmpty)
        .map { line =>
          val i = line.indexOf('=')
          line.substring(0, i) -> line.substring(i + 1)
        }
        .toMap
      params.foreach { case (k, v) =>
        stored.get(k).foreach { s =>
          require(s == v,
            s"maintenance state at $stateDir was bootstrapped with $k=$s but this ingest " +
              s"passed $k=$v — mixing parameters corrupts the persisted index; pass the " +
              "bootstrap values (or bootstrap a fresh state dir)")
        }
      }
    }
  }
}
