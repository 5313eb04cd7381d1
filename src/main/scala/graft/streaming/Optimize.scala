package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.streaming.sinks.{FileStreamSinkLog, SinkFileStatus}

/** OPTIMIZE for LIVE manifest-committed streaming tables — in-place
  * small-file compaction UNDER the `_spark_metadata` manifest.
  *
  * [[graft.sources.FileIO.compact]] rewrites a plain directory to a NEW
  * location; a streaming sink's table cannot move (its writer's
  * checkpoint and its readers both point at the path), and its readers
  * list files through the manifest — so compaction must atomically
  * replace the MANIFEST's view while the data directory temporarily
  * holds both generations. Spark's sink log is add-only (no delete
  * action since Spark 3), so retiring small files requires REBUILDING
  * the log, not appending to it.
  *
  * Protocol (the Sidecar single-commit-point discipline applied to
  * Spark's fixed-location manifest):
  *  1. stop-the-writer guard (same as [[StreamSinks.vacuum]]) — refuses
  *     while any active streaming query in this session sinks here;
  *  2. committed files below `smallFileBytes` are read back (partition
  *     values re-attached from their Hive-style dir names as exact
  *     strings) and rewritten as ⌈bytes/targetFileBytes⌉ files per the
  *     layout, landing under the invisible `_graft_optimize_data`
  *     staging dir, then moved to `graft-compact-<uuid>` names in their
  *     final partition dirs — still invisible: nothing references them;
  *  3. a replacement log is staged at `_graft_optimize_stage_meta`:
  *     the batch-id WINDOW the reader resolves (`getAllValidBatches` of
  *     the preserved latest id) is rewritten so every batch is empty
  *     except the latest, which lists kept + compacted files. The
  *     writer's latest batch id is PRESERVED, so a checkpointed writer
  *     restarted after the swap appends batch N+1 normally and a
  *     replayed batch ≤ N is still skipped (exactly-once intact);
  *  4. the swap: `_COMMITTED` marker lands in the stage dir, then
  *     `_spark_metadata` → `.bak`, stage → `_spark_metadata`, `.bak`
  *     deleted. A crash between renames leaves a state [[repairOptimize]]
  *     resolves DETERMINISTICALLY (marker present ⇒ roll forward,
  *     absent ⇒ roll back). CAVEAT (spec-pinned): in the window where
  *     `_spark_metadata` is renamed away, Spark readers FALL BACK to
  *     plain directory listing and would see retired AND compacted
  *     generations together — run repair before serving reads after a
  *     crash, exactly as a half-restored database is fsck'd before use.
  *
  * Retired small files stay on disk, unreferenced — invisible to
  * manifest readers and swept by the graced [[StreamSinks.vacuum]] like
  * any other orphan (in-flight readers that resolved the OLD manifest
  * keep their files until the grace expires).
  *
  * At 100 TB this is the maintenance pass that keeps a long-running
  * sink's file count O(data/target) instead of O(batches × tasks): the
  * rewrite cost is O(small bytes), never O(table).
  */
object Optimize {

  final case class OptimizeReport(
      compactedFiles: Int,
      outputFiles: Int,
      keptFiles: Int,
      latestBatchId: Long,
      retired: Seq[String])

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def metaDir(path: String) = new Path(s"$path/_spark_metadata")
  private def bakDir(path: String) = new Path(s"$path/_spark_metadata.bak")
  private def stageMetaDir(path: String) = new Path(s"$path/_graft_optimize_stage_meta")
  private def stageDataDir(path: String) = new Path(s"$path/_graft_optimize_data")
  private def marker(stage: Path) = new Path(stage, "_COMMITTED")

  private def sinkLog(spark: SparkSession, logPath: String): FileStreamSinkLog =
    new FileStreamSinkLog(FileStreamSinkLog.VERSION, spark, logPath)

  /** The file's partition sub-path relative to the table root — "" for
    * root-level files, "k=v/k2=v2" for Hive-layout files. */
  private def partitionSubPath(fileUri: String, rootAbs: String): String = {
    val abs = Path.getPathWithoutSchemeAndAuthority(new Path(fileUri)).toString
    require(abs.startsWith(rootAbs + "/"), s"committed file $abs outside table root $rootAbs")
    val rel = abs.stripPrefix(rootAbs + "/")
    val cut = rel.lastIndexOf('/')
    if (cut < 0) "" else rel.substring(0, cut)
  }

  /** @param zOrderDims when set, the compacted files are also Z-ORDER
    *        clustered on the two dimensions ([[graft.sources.FileIO
    *        .zOrdered]]) — compaction and re-clustering in ONE rewrite
    *        (a long-running sink's batches arrive time-clustered at
    *        best; this restores 2-D file skipping as part of the same
    *        maintenance pass). Unpartitioned tables only: a partitioned
    *        layout already carries its first dimension in the dirs. */
  def optimizeSink(
      spark: SparkSession,
      path: String,
      format: String = "parquet",
      smallFileBytes: Long = 32L * 1024 * 1024,
      targetFileBytes: Long = 128L * 1024 * 1024,
      zOrderDims: Option[(String, String)] = None
  ): OptimizeReport = {
    StreamSinks.requireNoActiveWriter(spark, path, "optimizeSink")
    val fs = fsFor(spark, path)
    require(
      !fs.exists(bakDir(path)) && !fs.exists(stageMetaDir(path)) && !fs.exists(stageDataDir(path)),
      s"optimizeSink($path): leftover stage/backup dirs from an interrupted run — " +
        "run repairOptimize first")
    val rootAbs = graft.sources.FileIO.tableRootAbs(spark, path)

    val log = sinkLog(spark, metaDir(path).toString)
    val latest = log.getLatestBatchId().getOrElse(
      throw new IllegalStateException(s"optimizeSink($path): no committed batches"))
    val all = log.allFiles().toSeq
    val (small, kept) = all.partition(_.size < smallFileBytes)
    if (small.size < 2) {
      return OptimizeReport(0, 0, all.size, latest.asInstanceOf[Long], Nil)
    }

    // ---- stage the compacted data files -------------------------------
    val smallPaths = small.map(_.sparkPath.toPath.toString)
    val subPaths = small.map(s => partitionSubPath(s.path, rootAbs))
    val partCols: Seq[String] = subPaths.filter(_.nonEmpty).headOption
      .map(_.split('/').toSeq.map(_.split("=", 2)(0))).getOrElse(Nil)
    val totalSmall = small.map(_.size).sum
    val nOut = math.max(1L, (totalSmall + targetFileBytes - 1) / targetFileBytes).toInt

    val stageData = stageDataDir(path)
    // partition values must round-trip VERBATIM into the rewritten dirs —
    // string-typed inference, restored afterwards
    val inferKey = "spark.sql.sources.partitionColumnTypeInference.enabled"
    val inferWas = spark.conf.getOption(inferKey)
    spark.conf.set(inferKey, "false")
    try {
      val reader = spark.read.format(format).option("basePath", path)
      val df = reader.load(smallPaths: _*)
      require(zOrderDims.isEmpty || partCols.isEmpty,
        s"optimizeSink($path): z-order clustering applies to unpartitioned tables " +
          s"(this table partitions on ${partCols.mkString(",")})")
      val writer = (zOrderDims, partCols) match {
        case (Some((a, b)), _) => graft.sources.FileIO.zOrdered(df, a, b, nOut).write
        case (None, Nil)       => df.coalesce(nOut).write
        case (None, cols)      =>
          df.repartition(nOut, cols.map(col): _*).write.partitionBy(cols: _*)
      }
      writer.mode(org.apache.spark.sql.SaveMode.Overwrite).format(format).save(stageData.toString)
    } finally {
      inferWas.fold(spark.conf.unset(inferKey))(v => spark.conf.set(inferKey, v))
    }

    // move staged files to their final partition dirs under fresh names —
    // still unreferenced, so still invisible to every reader
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    def dataFilesUnder(p: Path): Seq[Path] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Nil
        else if (st.isDirectory) dataFilesUnder(st.getPath)
        else Seq(st.getPath)
      }
    val staged = dataFilesUnder(stageData)
    val moved = staged.zipWithIndex.map { case (src, i) =>
      val rel = src.toString.stripPrefix(fs.makeQualified(stageData).toString).stripPrefix("/")
      val cut = rel.lastIndexOf('/')
      val sub = if (cut < 0) "" else rel.substring(0, cut)
      val destDir = if (sub.isEmpty) new Path(path) else new Path(path, sub)
      fs.mkdirs(destDir)
      val dest = new Path(destDir, s"graft-compact-$uuid-$i.$format")
      require(fs.rename(src, dest), s"optimizeSink: rename $src -> $dest failed")
      dest
    }
    fs.delete(stageData, true)

    // ---- stage the replacement manifest -------------------------------
    // rebuild ONLY the window a reader resolves — O(compactInterval)
    // metadata writes, never O(batches) (measured: the 0..latest rebuild
    // this replaces cost ~48 ms/batch, unusable at a production sink's
    // 100k batches). A reader of the sink log resolves from the newest
    // `.compact` file: the snapshot lands as a manually-serialized
    // compact file at the conf-consistent boundary ≤ latest, followed by
    // empty plain batches up to latest (none of which is itself a
    // boundary). A writer restarted after the swap appends latest+1 and,
    // at its next boundary, compacts over exactly the ids we staged.
    // Below the first boundary the full 0..latest replay is ≤ interval
    // writes anyway.
    val stageMeta = stageMetaDir(path)
    val stageLog = sinkLog(spark, stageMeta.toString)
    val latestId = latest.asInstanceOf[Long]
    val newEntries: Array[SinkFileStatus] =
      (kept.toArray ++ moved.map(p => SinkFileStatus(fs.getFileStatus(p))))
    val interval = spark.conf
      .getOption("spark.sql.streaming.fileSink.log.compactInterval").map(_.toInt).getOrElse(10)
    require(interval > 0, s"optimizeSink: bad fileSink.log.compactInterval $interval")
    val head = latestId - ((latestId + 1) % interval) // newest boundary ≤ latest, or negative
    if (head >= 0) {
      val out = fs.create(new Path(stageMeta, s"$head.compact"), true)
      try stageLog.serialize(newEntries, out) finally out.close()
      ((head + 1) to latestId).foreach { id =>
        require(stageLog.add(id, Array.empty[SinkFileStatus]),
          s"optimizeSink: staging manifest batch $id failed")
      }
    } else {
      (0L to latestId).foreach { id =>
        val content = if (id == latestId) newEntries else Array.empty[SinkFileStatus]
        require(stageLog.add(id, content), s"optimizeSink: staging manifest batch $id failed")
      }
    }
    val mk = fs.create(marker(stageMeta), true); mk.close()

    // ---- the swap ------------------------------------------------------
    require(fs.rename(metaDir(path), bakDir(path)),
      s"optimizeSink: could not retire the live manifest at ${metaDir(path)}")
    require(fs.rename(stageMeta, metaDir(path)),
      s"optimizeSink: could not promote the staged manifest — run repairOptimize")
    fs.delete(marker(metaDir(path)), false)
    fs.delete(bakDir(path), true)

    OptimizeReport(small.size, moved.size, kept.size, latestId,
      small.map(_.sparkPath.toPath.toString))
  }

  /** Resolve an interrupted [[optimizeSink]] swap — deterministic:
    * a live manifest wins (leftovers rolled back); no manifest + a
    * `_COMMITTED`-marked stage rolls FORWARD; anything else restores the
    * backup. Returns what it did. */
  def repairOptimize(spark: SparkSession, path: String): String = {
    val fs = fsFor(spark, path)
    val meta = metaDir(path)
    val bak = bakDir(path)
    val stage = stageMetaDir(path)
    val data = stageDataDir(path)
    if (fs.exists(data)) fs.delete(data, true)
    if (fs.exists(meta)) {
      // crash before the swap started (or after it finished): the live
      // manifest is authoritative; staged/backup leftovers are debris
      val swept = Seq(stage, bak).filter(fs.exists)
      swept.foreach(fs.delete(_, true))
      fs.delete(marker(meta), false)
      if (swept.isEmpty) "clean" else s"rolled-back: swept ${swept.mkString(", ")}"
    } else if (fs.exists(stage) && fs.exists(marker(stage))) {
      // crash between the two renames: the stage was fully committed —
      // finish the promotion
      require(fs.rename(stage, meta), s"repairOptimize: promote $stage failed")
      fs.delete(marker(meta), false)
      if (fs.exists(bak)) fs.delete(bak, true)
      "rolled-forward"
    } else if (fs.exists(bak)) {
      // incomplete stage: the old manifest is the only committed truth
      if (fs.exists(stage)) fs.delete(stage, true)
      require(fs.rename(bak, meta), s"repairOptimize: restore $bak failed")
      "restored-backup"
    } else {
      throw new IllegalStateException(
        s"repairOptimize($path): no manifest, no committed stage, no backup — not a sink table")
    }
  }
}
