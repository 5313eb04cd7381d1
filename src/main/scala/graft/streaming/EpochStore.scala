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
  *   <store>_minor_<a>_<b>/ MINOR generation (tiered compaction): the
  *                          fold of loose epochs a..b only — O(tail)
  *                          cost, see [[minorFold]]
  *   _CURRENT_MAP           live ingest epoch / cluster-map version
  *   _BASE_EPOCH            compacted-through pointer B (absent = 0)
  *   _MINOR_FOLDS           committed minor ranges, "a-b" per line
  *   _PARAMS                index parameters pinned at bootstrap
  *   _WRITER_LEASE          writer fence: holder id + heartbeat mtime
  *                          (see [[fence]])
  *
  * Committed view of a store = `<store>_base_v<B>` ∪ live minor
  * generations ∪ loose `epoch=N` for B < N ≤ pointer not covered by a
  * minor. All pointers flip through the same temp-file + atomic-rename
  * protocol, so both compaction tiers inherit the loops' crash contract
  * verbatim: staged `_base_v<B>` / `_minor_a_b` directories are
  * invisible until their single pointer flip (`_BASE_EPOCH` resp. the
  * `_MINOR_FOLDS` rewrite); a crash anywhere before it leaves the old
  * listing live and the staged generations inert (a rerun overwrites
  * them); after it, the superseded `epoch=N` dirs, covered epochs,
  * dead minors, and older base generations are reclaimed by
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
  private[graft] def minorGenDir(stateDir: String, store: String, a: Int, b: Int) =
    s"$stateDir/${store}_minor_${a}_$b"
  private[streaming] def mainPointerPath(stateDir: String) = s"$stateDir/_CURRENT_MAP"
  private[streaming] def basePointerPath(stateDir: String) = s"$stateDir/_BASE_EPOCH"
  private[graft] def minorFoldsPath(stateDir: String) = s"$stateDir/_MINOR_FOLDS"
  private def paramsPath(stateDir: String) = s"$stateDir/_PARAMS"
  private[streaming] def leasePath(stateDir: String) = s"$stateDir/_WRITER_LEASE"

  /** How long a writer's lease outlives its last heartbeat before another
    * maintainer may take the state dir over (a crashed writer leaves its
    * lease behind forever; a live loop refreshes it on every mutation). */
  val DefaultLeaseGraceMs: Long = 10 * 60 * 1000L

  /** Thrown by [[committed]] when the requested epoch ceiling is below
    * the compacted base / a live minor fold. For a HEALTHY store this is
    * the signature of a stale pointer resolve racing a compaction —
    * which `snapshot` retries with a fresh pointer — whereas every other
    * failure of the committed view (bootstrap absent, an epoch dir
    * externally deleted) is real corruption that must surface
    * immediately, not be retried five times. Subclasses
    * IllegalArgumentException so callers treating it as a plain require
    * failure are unaffected. */
  final class StaleViewException(msg: String) extends IllegalArgumentException(msg)

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
    * and HDFS, never observable half-written. The temp name is
    * per-call-unique so two writers racing the same pointer (possible
    * only during a fence takeover race, where exactly one will win the
    * CAS) can never rename each other's temp out from underneath — the
    * loser's leftover `<name>.tmp.*` is inert (underscore/pointer-named,
    * ignored by every reader). */
  private[graft] def writeAtomic(spark: SparkSession, path: String, body: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(path)
    val tmp = new Path(path + ".tmp." + java.util.UUID.randomUUID().toString.take(8))
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

  /** Parse a lease body into (holderId, generation). A pre-generation
    * lease file (single line, written by an older build) parses as
    * generation 0 — the first takeover bumps it to 1. */
  private def parseLease(body: String): (String, Long) = {
    val lines = body.split("\n").map(_.trim).filter(_.nonEmpty)
    (lines.headOption.getOrElse(""), if (lines.length > 1) lines(1).toLong else 0L)
  }

  /** Current lease generation, 0 when no lease file exists. Mutators that
    * cannot call [[fence]] at their own entry (their caller already did)
    * observe this at entry and hand it to the commit-point [[refence]]. */
  private[streaming] def leaseGen(spark: SparkSession, stateDir: String): Long = {
    val p = new Path(leasePath(stateDir))
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) 0L else parseLease(readSmallFile(spark, p))._2
  }

  /** WRITER FENCING for a maintenance state dir: assert this writer may
    * mutate it, then write/refresh the lease (`_WRITER_LEASE` — writer id
    * on line 1, lease GENERATION on line 2, last heartbeat as mtime;
    * every mutation of a live loop re-acquires, so the heartbeat rides
    * the ingest cadence for free). Returns the generation now held — the
    * token the commit-point [[refence]] must match.
    *
    * A DIFFERENT writer holding a lease younger than `graceMs` means two
    * maintainers are pointed at one state dir — the second REJECTS loudly
    * here instead of interleaving pointer flips and corrupting the store
    * (the reference gets this isolation for free from Flink's
    * subtask-indexed filenames, RowOrcBucketingSink.java:125; a
    * shared-state-dir loop does not). A lease older than the grace window
    * is a crashed writer's: takeover proceeds through [[casTakeover]] —
    * an atomic `create(overwrite=false)` on a generation-numbered claim
    * file, so two acquirers racing for the same takeover deterministically
    * get ONE winner (the loser throws), and the lease generation bumps so
    * any still-running mutation of the previous holder fails its
    * commit-point [[refence]] even if this winner later crashes too.
    *
    * Lease age compares this writer's clock against the FILESYSTEM's
    * mtime (HDFS: namenode clock), so cross-machine writer clock skew
    * should be budgeted into `graceMs` — the 10-minute default dwarfs
    * NTP-managed skew. */
  private[streaming] def fence(
      spark: SparkSession,
      stateDir: String,
      writerId: Option[String] = None,
      graceMs: Long = DefaultLeaseGraceMs
  ): Long = {
    val id = writerId.getOrElse(spark.sparkContext.applicationId)
    val p = new Path(leasePath(stateDir))
    val fs = fsOf(spark, p)
    if (fs.exists(p)) {
      val (held, gen) = parseLease(readSmallFile(spark, p))
      if (held == id) {
        // heartbeat refresh — same holder keeps its generation
        writeAtomic(spark, leasePath(stateDir), s"$id\n$gen")
        gen
      } else {
        val age = System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime
        if (age <= graceMs)
          throw new IllegalStateException(
            s"maintenance state at $stateDir is leased to writer '$held' " +
              s"(heartbeat ${age / 1000}s ago, grace ${graceMs / 1000}s): a second concurrent " +
              s"maintainer '$id' would interleave pointer flips and corrupt the store — " +
              "stop the other loop, or wait out the grace window for a crashed writer")
        casTakeover(spark, stateDir, id, expectedGen = gen, graceMs)
      }
    } else casTakeover(spark, stateDir, id, expectedGen = 0L, graceMs)
  }

  /** Compare-and-swap lease takeover. The acquire itself is made atomic
    * by `FileSystem.create(overwrite = false)` on a claim file numbered
    * with the TARGET generation (atomic on HDFS and local FS): of two
    * writers racing to take over the same observed generation, exactly
    * one creates the claim — the other throws. The winner then re-reads
    * the lease before advancing it (a racer that already won AND released
    * its claim shows up as an advanced generation, not a live claim) and
    * finally drops the claim.
    *
    * A crashed claimant's claim — created but the lease never advanced —
    * is never DELETED for reclamation (delete-then-create is its own
    * TOCTOU: two acquirers both observe the aged claim, one deletes it
    * and creates afresh, the other's delete removes the FRESH claim and
    * its own create succeeds — two winners). Instead the generation is
    * SKIPPED: the acquirer probes upward past every stale claim to the
    * first unclaimed generation, so the atomic exclusive create stays
    * the single serialization point and stale claims are inert debris
    * (GC'd by the eventual winner AFTER its lease write, when any racer
    * that could still create a lower-numbered claim is already doomed
    * by the post-create lease re-verify). Generations stay strictly
    * monotone — skipping numbers is harmless; [[refence]] matches on
    * equality, never arithmetic. A LIVE claim (younger than grace)
    * still rejects loudly; a live claimant advances the lease within
    * one round trip, never minutes. */
  private def casTakeover(
      spark: SparkSession,
      stateDir: String,
      id: String,
      expectedGen: Long,
      graceMs: Long
  ): Long = {
    val fs = fsOf(spark, new Path(leasePath(stateDir)))
    // Probe upward past stale claims to the first unclaimed generation.
    // Bounded: claims only accumulate one per crashed takeover.
    var newGen = expectedGen + 1
    var probing = true
    while (probing) {
      val c = new Path(s"${leasePath(stateDir)}.claim.$newGen")
      if (!fs.exists(c)) probing = false
      else {
        val age = System.currentTimeMillis() - fs.getFileStatus(c).getModificationTime
        if (graceMs > 0 && age <= graceMs)
          throw new IllegalStateException(
            s"maintenance state at $stateDir: takeover of lease generation $expectedGen is " +
              s"already claimed by a racing writer ($c is ${age / 1000}s old) — writer '$id' " +
              "loses the race deterministically; retry after the winner's heartbeat or its " +
              "claim ages out")
        newGen += 1 // stale claim: crashed claimant — skip its generation
      }
    }
    val claim = new Path(s"${leasePath(stateDir)}.claim.$newGen")
    // The exclusive create must be ATOMIC, or two racers both pass: on
    // HDFS `create(overwrite=false)` is a single namenode op, but the
    // Hadoop LOCAL filesystem implements it as exists()-then-open — a
    // TOCTOU window a real thread race walks straight through (this
    // spec-discovered race is pinned in CasLeaseSpec). For file:// the
    // O_CREAT|O_EXCL guarantee comes from java.nio Files.createFile.
    val created =
      try {
        if (fs.getScheme == "file") {
          val f = new java.io.File(claim.toUri.getPath)
          Option(f.getParentFile).foreach(_.mkdirs())
          java.nio.file.Files.createFile(f.toPath)
          java.nio.file.Files.write(f.toPath, id.getBytes("UTF-8"))
          true
        } else {
          val out = fs.create(claim, false)
          try out.write(id.getBytes("UTF-8")) finally out.close()
          true
        }
      } catch { case _: java.io.IOException => false }
    if (!created)
      throw new IllegalStateException(
        s"maintenance state at $stateDir: takeover of lease generation $expectedGen is " +
          s"already claimed by a racing writer ($claim exists) — writer '$id' loses the race " +
          "deterministically; retry after the winner's heartbeat or its claim ages out")
    try {
      val pl = new Path(leasePath(stateDir))
      if (fs.exists(pl)) {
        val (heldNow, genNow) = parseLease(readSmallFile(spark, pl))
        if (genNow != expectedGen)
          throw new IllegalStateException(
            s"maintenance state at $stateDir: lease advanced to generation $genNow " +
              s"(holder '$heldNow') while writer '$id' raced to claim ${newGen} — takeover lost")
      }
      writeAtomic(spark, leasePath(stateDir), s"$id\n$newGen")
      // Post-win GC of skipped stale claims: safe only NOW — any racer
      // that could still create one of these lower-numbered claims read
      // the lease at expectedGen and its post-create re-verify (above)
      // will see the advanced generation and abort.
      ((expectedGen + 1) until newGen).foreach { g =>
        fs.delete(new Path(s"${leasePath(stateDir)}.claim.$g"), false)
      }
      newGen
    } finally { fs.delete(claim, false); () }
  }

  /** Commit-point RE-FENCE: assert this writer STILL holds the lease at
    * the very generation it entered with, then refresh the heartbeat.
    * Unlike [[fence]], this NEVER takes over — a stale foreign lease here
    * means this writer lost the store mid-mutation to a successor that
    * may have committed epochs, and "the successor has since crashed or
    * gone idle" does not make committing entry-time values safe: the
    * promote would delete the successor's committed generations and the
    * pointer writes would move `_CURRENT_MAP`/`_BASE_EPOCH` BACKWARDS
    * past its commits — exactly the regression the fence exists to
    * prevent. The generation match additionally rejects the same-id ABA
    * (this writer's own restart re-acquired the store while an old stuck
    * mutation was still in flight). */
  private[streaming] def refence(
      spark: SparkSession,
      stateDir: String,
      writerId: Option[String],
      entryGen: Long
  ): Unit = {
    val id = writerId.getOrElse(spark.sparkContext.applicationId)
    val p = new Path(leasePath(stateDir))
    val fs = fsOf(spark, p)
    if (!fs.exists(p))
      throw new IllegalStateException(
        s"maintenance state at $stateDir: lease vanished before the commit point — writer " +
          s"'$id' cannot prove it still owns the store; aborting with its staging left inert")
    val (held, gen) = parseLease(readSmallFile(spark, p))
    if (held != id)
      throw new IllegalStateException(
        s"maintenance state at $stateDir is leased to writer '$held' but '$id' reached its " +
          "commit point — the store was taken over mid-mutation, and the commit-point " +
          "re-fence never takes over (committing entry-time pointers would regress past " +
          "the successor's commits); this writer's staging stays inert")
    if (gen != entryGen)
      throw new IllegalStateException(
        s"maintenance state at $stateDir: writer '$id' entered at lease generation $entryGen " +
          s"but the lease is now at generation $gen — the store was taken over (and " +
          "re-acquired) mid-mutation; committing entry-time pointers would regress past the " +
          "intervening commits, so this mutation aborts with its staging inert")
    writeAtomic(spark, leasePath(stateDir), s"$id\n$gen")
  }

  /** Writer-unique staging path for a final directory: mutators write
    * their output HERE, and only [[promoteStaged]] — which runs strictly
    * AFTER the commit-point re-[[fence]] — moves it into place. Writing
    * directly to the final path would let a writer that lost its lease
    * mid-batch clobber the successor's committed data with its Overwrite
    * staging writes long before any pointer check runs (both writers
    * compute the same `next` from the same pointer). Staging lives in a
    * hidden `.staging_<writer>` dir at the state root — NEVER inside a
    * store dir, where a non-numeric `epoch=N…` sibling would corrupt the
    * Hive partition discovery the pre-compaction read path uses (leading
    * dot also keeps every Spark file index ignoring it). */
  private[streaming] def stagePath(stateDir: String, finalPath: String, writerId: String): String = {
    val rel = finalPath.stripPrefix(stateDir).stripPrefix("/").replaceAll("[/=]", "_")
    s"$stateDir/.staging_${writerId.replaceAll("[^A-Za-z0-9_-]", "_")}/$rel"
  }

  /** Move writer-unique staged dirs into their final paths. The caller
    * must have passed [[fence]] immediately before: once the fence says
    * this writer still owns the store, any pre-existing final dir is a
    * prior crashed attempt's debris (nothing above the committed
    * pointers is referenced), so delete + rename is safe — and a writer
    * that lost the store throws at the fence with its staging left
    * inert. A crash between renames leaves a mix of staged and final
    * dirs, all invisible until the pointer flip; replay re-stages and
    * re-promotes over both. */
  private[streaming] def promoteStaged(
      spark: SparkSession, pairs: Seq[(String, String)]): Unit =
    pairs.foreach { case (tmp, dst) =>
      val t = new Path(tmp)
      val d = new Path(dst)
      val fs = fsOf(spark, t)
      require(fs.exists(t), s"staged dir $tmp missing at promote — staging did not run?")
      if (fs.exists(d)) fs.delete(d, true)
      require(fs.rename(t, d), s"promote rename $tmp -> $dst failed")
    }

  /** Drop this writer's lease (clean shutdown of a maintenance loop).
    * No-op when absent or held by someone else — releasing must never
    * fence-break a successor that already took over. */
  def releaseLease(spark: SparkSession, stateDir: String, writerId: Option[String] = None): Unit = {
    val id = writerId.getOrElse(spark.sparkContext.applicationId)
    val p = new Path(leasePath(stateDir))
    val fs = fsOf(spark, p)
    if (fs.exists(p) && parseLease(readSmallFile(spark, p))._1 == id) fs.delete(p, false)
    ()
  }

  /** Compacted-through epoch B; 0 if this state was never compacted.
    * The `_BASE_EPOCH` body is `"<B> <commitTimeMs>"` — the timestamp is
    * what [[retireCompacted]] gates base-superseded victims on (see the
    * starvation note there); a pre-timestamp file (bare int) parses fine
    * and falls back to file mtime for the commit time. */
  def baseEpoch(spark: SparkSession, stateDir: String): Int = {
    val p = new Path(basePointerPath(stateDir))
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) 0
    else readSmallFile(spark, p).trim.split("\\s+")(0).toInt
  }

  /** When the live base generation committed (its `_BASE_EPOCH` flip);
    * 0 when never compacted. Falls back to the pointer file's mtime for
    * pre-timestamp files. */
  private[streaming] def baseCommitTime(spark: SparkSession, stateDir: String): Long = {
    val p = new Path(basePointerPath(stateDir))
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) 0L
    else {
      val toks = readSmallFile(spark, p).trim.split("\\s+")
      if (toks.length > 1) toks(1).toLong else fs.getFileStatus(p).getModificationTime
    }
  }

  /** Remove the base + minor-fold pointers — called by the loops'
    * `bootstrap` so re-bootstrapping a previously-compacted state dir
    * restarts from scratch (pre-compaction semantics: stale epochs > 1
    * are staged-invisible debris; a stale base/minor pointer would
    * instead make every committed read resolve through dead
    * generations). Old `<store>_base_v*` / `<store>_minor_*` dirs become
    * inert debris the next fold overwrites or supersedes. */
  private[streaming] def clearBasePointer(spark: SparkSession, stateDir: String): Unit = {
    Seq(basePointerPath(stateDir), minorFoldsPath(stateDir)).foreach { path =>
      val p = new Path(path)
      val fs = fsOf(spark, p)
      if (fs.exists(p)) fs.delete(p, false)
    }
  }

  /** Committed minor folds LIVE above the base epoch `b`: parsed from
    * `_MINOR_FOLDS` ("a-b ts" per line, ts = that range's commit time —
    * what [[retireCompacted]] gates its covered-epoch victims on),
    * entries fully covered by the base generation filtered out (a major
    * fold supersedes them; the file is pruned cosmetically by
    * [[retireCompacted]], but the read path never depends on that).
    * Ranges are disjoint and ascending by construction — [[minorFold]]
    * always folds from the first uncovered epoch. Pre-timestamp lines
    * (bare "a-b") fall back to the file's mtime. */
  private[graft] def minorFolds(spark: SparkSession, stateDir: String): Seq[(Int, Int)] =
    minorFoldsWithTs(spark, stateDir).map { case (a, b, _) => (a, b) }

  private[streaming] def minorFoldsWithTs(
      spark: SparkSession, stateDir: String): Seq[(Int, Int, Long)] = {
    val p = new Path(minorFoldsPath(stateDir))
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Seq.empty
    else {
      val mtime = fs.getFileStatus(p).getModificationTime
      val b = baseEpoch(spark, stateDir)
      readSmallFile(spark, p).split("\n").toSeq
        .map(_.trim).filter(_.nonEmpty)
        .map { line =>
          val toks = line.split("\\s+")
          val i = toks(0).indexOf('-')
          val ts = if (toks.length > 1) toks(1).toLong else mtime
          (toks(0).substring(0, i).toInt, toks(0).substring(i + 1).toInt, ts)
        }
        .filter { case (a, bb, _) => require(a <= bb, s"corrupt minor range $a-$bb"); bb > b }
        .sortBy { case (a, bb, _) => (a, bb) }
    }
  }

  private def writeMinorFolds(
      spark: SparkSession, stateDir: String, ranges: Seq[(Int, Int, Long)]): Unit =
    writeAtomic(spark, minorFoldsPath(stateDir),
      ranges.map { case (a, b, ts) => s"$a-$b $ts" }.mkString("\n"))

  /** MINOR fold (tiered compaction, L0→L1): fold the loose committed
    * epoch tail `from..upTo` of each store into one
    * `<store>_minor_<from>_<upTo>` generation — cost O(tail), NOT
    * O(corpus) like the major [[compact]], so a long-running loop can
    * keep its committed listing bounded without re-writing the whole
    * base every few batches. The committed view is identical before and
    * after. Crash contract inherited verbatim: the staged minor dirs are
    * invisible until the single `_MINOR_FOLDS` rewrite (atomic rename);
    * a crash before it leaves the loose epochs live and the staged dirs
    * inert debris a rerun overwrites.
    *
    * Amortized ingest cost with the two-level policy
    * ([[CorpusMaintenance.maybeCompact]]'s `majorEvery`): minor folds
    * every K batches cost O(K·batch); the major fold runs once per G
    * minors, so its O(corpus) rewrite amortizes to corpus/(K·G) per
    * ingest instead of corpus/K — at 100 TB the difference between
    * re-writing the corpus every 8 batches and every 64. Listing stays
    * bounded at O(K + G) directories per store. */
  private[graft] def minorFold(
      spark: SparkSession,
      stateDir: String,
      stores: Seq[String],
      from: Int,
      upTo: Int,
      writerId: Option[String] = None,
      leaseGraceMs: Long = DefaultLeaseGraceMs
  ): Unit = {
    val entryGen = leaseGen(spark, stateDir)
    val live = readIntPointer(spark, mainPointerPath(stateDir))
    val b = baseEpoch(spark, stateDir)
    val existing = minorFoldsWithTs(spark, stateDir)
    val covered = math.max(b, existing.lastOption.map(_._2).getOrElse(0))
    require(upTo <= live, s"minorFold upTo=$upTo beyond the committed pointer $live")
    require(from == covered + 1,
      s"minorFold must start at the first uncovered epoch ${covered + 1}, got $from " +
        "(gaps or overlaps would corrupt the committed view)")
    require(upTo >= from, s"minorFold empty range $from..$upTo")
    val wid = writerId.getOrElse(spark.sparkContext.applicationId)
    val staged = stores.map { store =>
      val base = s"$stateDir/$store"
      val dst = minorGenDir(stateDir, store, from, upTo)
      val tmp = stagePath(stateDir, dst, wid)
      spark.read.parquet((from to upTo).map(epochDir(base, _)): _*)
        .write.mode(SaveMode.Overwrite).parquet(tmp)
      tmp -> dst
    }
    // commit-point re-fence (generation-matched, never takes over) —
    // same contract as [[compact]] — plus a belt-and-braces check that
    // the fold metadata is exactly as read at entry (a SAME-ID concurrent
    // mutation shares the lease generation and only this catches it)
    refence(spark, stateDir, writerId, entryGen)
    require(baseEpoch(spark, stateDir) == b && minorFoldsWithTs(spark, stateDir) == existing,
      s"minorFold at $stateDir: fold metadata changed between entry and commit — a " +
        "concurrent same-writer mutation is running against this store (the single-writer " +
        "contract requires serializing mutations within one writer id too)")
    promoteStaged(spark, staged)
    writeMinorFolds(spark, stateDir, existing :+ ((from, upTo, System.currentTimeMillis())))
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
    val minors = minorFolds(spark, stateDir)
    if (b == 0 && minors.isEmpty) {
      spark.read.parquet(base).filter(col("epoch") <= upTo).drop("epoch")
    } else {
      // StaleViewException (not a plain require): on a healthy store this
      // is what a pointer resolve racing a compaction looks like, and the
      // snapshot() callers retry exactly this — nothing else.
      if (upTo < b)
        throw new StaleViewException(
          s"committed($store) asked for epochs <= $upTo below the compacted base epoch $b: " +
            "compaction only folds COMMITTED epochs and the pointer never moves backwards " +
            "past it, so this indicates a stale pointer resolve racing a compaction, " +
            "pointer/state corruption, or a gate-style pointer reset into a compacted " +
            "store (unsupported)")
      minors.foreach { case (_, mb) =>
        if (mb > upTo)
          throw new StaleViewException(
            s"committed($store) asked for epochs <= $upTo below a live minor fold ending at $mb " +
              "— minor folds only cover COMMITTED epochs (a stale pointer resolve racing a " +
              "fold, or a gate-style pointer reset into a tiered store, which is unsupported)")
      }
      val fs = fsOf(spark, new Path(base))
      val minorCovered = minors.flatMap { case (a, mb) => a to mb }.toSet
      val loose = (b + 1 to upTo).filterNot(minorCovered).map { n =>
        val d = epochDir(base, n)
        require(fs.exists(new Path(d)),
          s"committed($store): epoch dir $d is missing but the pointers commit epochs " +
            s"($b, $upTo] — the store was externally deleted or partially copied; " +
            "refusing to serve a silently-shrunken view")
        d
      }
      val paths =
        (if (b > 0) Seq(baseGenDir(stateDir, store, b)) else Seq.empty) ++
          minors.map { case (a, mb) => minorGenDir(stateDir, store, a, mb) } ++
          loose
      spark.read.parquet(paths: _*)
    }
  }

  /** Fold committed epochs 1..`upTo` of each store into one base
    * generation. Blue/green: the staged `<store>_base_v<upTo>` dirs are
    * invisible until the single `_BASE_EPOCH` flip; a crash mid-compact
    * leaves the old listing live and a rerun overwrites the debris.
    * Superseded epoch dirs and older base generations stay on disk until
    * [[retireCompacted]] sweeps them. */
  def compact(
      spark: SparkSession,
      stateDir: String,
      stores: Seq[String],
      upTo: Int,
      writerId: Option[String] = None,
      leaseGraceMs: Long = DefaultLeaseGraceMs
  ): Unit = {
    val entryGen = leaseGen(spark, stateDir)
    val live = readIntPointer(spark, mainPointerPath(stateDir))
    val b0 = baseEpoch(spark, stateDir)
    require(upTo <= live, s"compact upTo=$upTo beyond the committed pointer $live")
    require(upTo > b0, s"compact upTo=$upTo does not advance the base epoch $b0")
    val wid = writerId.getOrElse(spark.sparkContext.applicationId)
    val staged = stores.map { store =>
      val dst = baseGenDir(stateDir, store, upTo)
      val tmp = stagePath(stateDir, dst, wid)
      committed(spark, stateDir, store, upTo)
        .write.mode(SaveMode.Overwrite).parquet(tmp)
      tmp -> dst
    }
    // Commit-point re-fence: the fold above can outlive the lease grace
    // window, and a successor may have legitimately taken the store
    // over — this writer must then FAIL here, with its writer-unique
    // staging left inert (never having touched any final path). The
    // re-fence is GENERATION-matched and never takes over, so even a
    // successor that committed and then itself crashed (its lease now
    // stale) still fences this writer out — committing entry-time values
    // would regress `_BASE_EPOCH` past its commits. The pointer re-reads
    // below catch the one case the lease can't: a same-id concurrent
    // mutation sharing this generation.
    refence(spark, stateDir, writerId, entryGen)
    require(baseEpoch(spark, stateDir) == b0 &&
        readIntPointer(spark, mainPointerPath(stateDir)) == live,
      s"compact at $stateDir: pointers moved between entry and commit (base " +
        s"${baseEpoch(spark, stateDir)} vs $b0, live " +
        s"${readIntPointer(spark, mainPointerPath(stateDir))} vs $live) — a concurrent " +
        "same-writer mutation is running against this store")
    promoteStaged(spark, staged)
    writeAtomic(spark, basePointerPath(stateDir), s"$upTo ${System.currentTimeMillis()}")
    // Drop the minor-folds file the new base supersedes. GC-only
    // cosmetics AFTER the one atomic commit above: the read path already
    // ignores minors ending ≤ the base epoch, so a crash between the
    // flip and this delete loses nothing. (Every live minor necessarily
    // ended ≤ upTo — the staging read's committed() view required it —
    // so post-flip there are no survivors to rewrite.)
    val p = new Path(minorFoldsPath(stateDir))
    val fs = fsOf(spark, p)
    if (fs.exists(p)) fs.delete(p, false)
    ()
  }

  /** GC after compaction: delete each store's `epoch=N` dirs with
    * N ≤ the committed base epoch, base generations older than the
    * live one, AND superseded/covered minor-fold dirs — epoch dirs a
    * LIVE minor fold covers (folded by [[minorFold]]) and minor dirs a
    * major fold made dead (end ≤ the base epoch). All behind the usual
    * mtime grace window (a reader that resolved the pointers just
    * before a flip finishes on what it started with). Returns the
    * deleted paths. */
  def retireCompacted(
      spark: SparkSession,
      stateDir: String,
      stores: Seq[String],
      graceMs: Long = 10 * 60 * 1000L
  ): Seq[String] = {
    val b = baseEpoch(spark, stateDir)
    val liveTs = minorFoldsWithTs(spark, stateDir)
    val liveDirs = stores.flatMap(store =>
      liveTs.map { case (a, mb, _) => minorGenDir(stateDir, store, a, mb) }).toSet
    val now = System.currentTimeMillis()
    val cutoff = now - graceMs
    // Grace is measured from EACH VICTIM'S OWN superseding commit — the
    // per-range timestamp recorded in `_MINOR_FOLDS` (resp. the commit
    // time inside `_BASE_EPOCH`) — NOT the shared pointer file's mtime:
    // every later fold rewrites that file and refreshes its mtime, so a
    // loop folding more often than the grace window would never reclaim
    // anything and disk would grow despite compaction (GC starvation).
    // An epoch written hours ago is superseded only at the instant ITS
    // fold's commit lands, and a reader that resolved committed()
    // seconds before that commit still holds the loose-epoch paths in
    // its plan — the per-victim commit age keeps those readers alive for
    // the full window; the victim-mtime check still guards anything
    // mid-write.
    val baseTs = baseCommitTime(spark, stateDir)
    val baseCommitAged = graceMs <= 0 || baseTs == 0L || baseTs < cutoff
    val minorSweep = stores.flatMap { store =>
      // epoch dirs covered by a live minor fold (they read from the
      // minor generation now; justified by THAT range's commit time) ...
      liveTs.flatMap { case (a, mb, ts) =>
        if (graceMs > 0 && ts >= cutoff) Seq.empty
        else
          (a to mb).flatMap { n =>
            val p = new Path(epochDir(s"$stateDir/$store", n))
            val fs = fsOf(spark, p)
            if (fs.exists(p) && fs.getFileStatus(p).getModificationTime < cutoff) {
              fs.delete(p, true); Some(p.toString)
            } else None
          }
      } ++ {
        // ... and minor dirs no live fold references (superseded by a
        // major — justified by the _BASE_EPOCH commit — or debris of a
        // crashed fold attempt)
        val root = new Path(stateDir)
        val fs = fsOf(spark, root)
        if (!baseCommitAged || !fs.exists(root)) Seq.empty
        else
          fs.listStatus(root).toSeq
            .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"${store}_minor_"))
            .filter(st => !liveDirs.contains(s"$stateDir/${st.getPath.getName}"))
            .filter(_.getModificationTime < cutoff)
            .map { st => fs.delete(st.getPath, true); st.getPath.toString }
      }
    }
    // crashed writers' staging debris: never referenced by any reader,
    // so the victim's own age is the right clock here
    val stagingSweep = {
      val root = new Path(stateDir)
      val fs = fsOf(spark, root)
      if (!fs.exists(root)) Seq.empty
      else
        fs.listStatus(root).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith(".staging_"))
          .filter(_.getModificationTime < cutoff)
          .map { st => fs.delete(st.getPath, true); st.getPath.toString }
    }
    val baseSweep =
      if (b == 0 || !baseCommitAged) Seq.empty
      else
        stores.flatMap { store =>
          Retention.retainEpochs(spark, s"$stateDir/$store", cut = b, graceMs = graceMs) ++
            Retention.retainVersioned(
              spark, stateDir, s"${store}_base_v", live = b, keep = 1, graceMs = graceMs)
        }
    minorSweep ++ stagingSweep ++ baseSweep
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
