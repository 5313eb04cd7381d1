package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Versioned table-sidecar commit protocol — ONE atomic pointer carries
  * BOTH the live version and the source-table fingerprint, so there is
  * no ordering window at all between "data swapped" and "staleness gate
  * updated" (the r13 bloom sidecar's delete-then-rename + fingerprint-
  * written-last recipe had a crash window where the sidecar was gone
  * and the next lookup failed loudly; here a mid-swap crash leaves the
  * OLD version serving, consistently gated, and the staged dir inert).
  *
  * Layout under a sidecar root (itself underscore-prefixed inside the
  * table dir, so scans never see it — the `_spark_metadata` convention):
  *
  *   <root>/v=N/…              — version N's data files (parquet)
  *   <root>/_CURRENT           — line 1: N (the live version);
  *                               remaining lines: the source table's
  *                               data-file identities at build time
  *                               (the staleness fingerprint)
  *
  * Writer protocol (single maintainer, same as EpochStore):
  *   1. write the new version's data into v=<current+1> — invisible,
  *      readers only dereference what _CURRENT names;
  *   2. flip _CURRENT via temp-file + atomic rename(OVERWRITE) — THE
  *      commit: version and fingerprint become visible together;
  *   3. GC superseded version dirs behind a _DEAD-marker grace window
  *      (the AggView recipe: mark at supersede time, sweep once the
  *      marker ages past the grace — in-flight readers that already
  *      dereferenced the old pointer keep their files until then).
  *
  * A crash before step 2 leaves the old pointer live and the staged dir
  * debris the next commit's GC marks and sweeps; a crash after step 2 is
  * a completed commit (GC re-runs on the next one). Reference behavior
  * re-derived from hiliuxg/flink-orc-sink's stage-then-promote commit
  * (RowOrcBucketingSink.java:190,209 — in-process → in-pending → final
  * renames at checkpoint) — the same invisible-until-promoted
  * discipline, applied to index sidecars with a pointer as the single
  * commit point.
  */
private[graft] object Sidecar {

  /** The committed state: live version, its data dir, the fingerprint. */
  final case class Current(version: Int, dataDir: String, fingerprint: Set[String])

  private def pointerPath(root: String) = s"$root/_CURRENT"
  private def versionDir(root: String, v: Int) = s"$root/v=$v"

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The committed sidecar state, None before the first commit. */
  def current(spark: SparkSession, root: String): Option[Current] = {
    val p = new Path(pointerPath(root))
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val lines = body.split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
      require(lines.nonEmpty, s"malformed sidecar pointer at $root: empty")
      val v = lines.head.toInt
      Some(Current(v, versionDir(root, v), lines.tail.toSet))
    }
  }

  /** Where the NEXT version's data goes — invisible until [[commit]].
    * Crash debris at the same path is overwritten by the writer
    * (single-maintainer contract, the EpochStore promoteStaged rule). */
  def nextStage(spark: SparkSession, root: String): (Int, String) = {
    val v = current(spark, root).map(_.version).getOrElse(0) + 1
    (v, versionDir(root, v))
  }

  /** THE commit: one atomic pointer flip makes version `v` and its
    * fingerprint visible together, then superseded/debris version dirs
    * are GC'd behind the grace window. */
  def commit(
      spark: SparkSession,
      root: String,
      v: Int,
      fingerprint: Set[String],
      gcGraceMs: Long = graft.streaming.EpochStore.DefaultLeaseGraceMs): Unit = {
    val body = (v.toString +: fingerprint.toSeq.sorted).mkString("\n")
    graft.streaming.EpochStore.writeAtomic(spark, pointerPath(root), body)
    // GC every non-live version dir (superseded versions AND crash
    // debris above the pointer): _DEAD-mark now, sweep once aged
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    if (fs.exists(rootP)) {
      val now = System.currentTimeMillis()
      fs.listStatus(rootP).foreach { s =>
        val n = s.getPath.getName
        if (s.isDirectory && n.startsWith("v=") && n != s"v=$v") {
          val marker = new Path(s"${s.getPath}/_DEAD")
          if (!fs.exists(marker)) { val o = fs.create(marker, true); o.close() }
          if (gcGraceMs <= 0 ||
              now - fs.getFileStatus(marker).getModificationTime > gcGraceMs)
            fs.delete(s.getPath, true)
        }
      }
    }
  }
}
