package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

/** INCREMENTAL MATERIALIZED AGGREGATE VIEW — the classic warehouse IVM:
  * a per-key totals table (`SELECT keys, SUM(x)…, COUNT(*) GROUP BY
  * keys`) maintained batch by batch, so the aggregate answer costs a
  * totals-table read instead of a full-corpus scan. The reference's
  * users build exactly this downstream of the ORC sink (hourly Hive
  * rollups over the committed files); here the rollup is maintained
  * inside the engine with a commit protocol instead of re-scanned.
  *
  * Merge algebra: every maintained column must be MERGEABLE — SUM and
  * COUNT merge by addition (this implementation), MIN/MAX would merge
  * by min/max (same shape, add when needed); AVG is derived at read
  * time as sum/count. Non-mergeable aggregates (exact median) need the
  * corpus and are out of scope by construction.
  *
  * Exactly-once under at-least-once redelivery: ADDITIVE merges are not
  * idempotent (re-applying a batch adds twice — unlike the key-REPLACE
  * upsert sink, which is naturally replay-safe), so the commit protocol
  * makes replay a structural no-op:
  *  - totals live in immutable `v=N/` version dirs; `_CURRENT` holds
  *    "version lastAppliedBatchId" and is flipped by atomic
  *    temp+rename — the SINGLE commit point (the EpochStore pointer
  *    discipline);
  *  - [[applyBatch]] first reads the pointer: `batchId <=
  *    lastAppliedBatchId` returns without touching anything, so a
  *    foreachBatch redelivery after a post-commit crash re-applies a
  *    no-op;
  *  - a crash BEFORE the flip leaves orphan `v=N+1` debris the next
  *    apply overwrites (blue/green) — the committed view never sees it.
  *  Batch ids must be monotone (Structured Streaming's foreachBatch
  *  contract); [[sink]] wires exactly that.
  *
  * Scale posture: an aggregate view is small by construction (one row
  * per key), so each apply rewrites the totals table — one narrow
  * groupBy of the BATCH (not the corpus), one full-outer merge join
  * against the current totals, one metadata-scale write. At a key
  * cardinality where the rewrite itself hurts, partition the totals by
  * a key-hash bucket and rewrite only the buckets the batch touches
  * (the `FileIO.upsertByKey` dynamic-partition-overwrite machinery) —
  * same pointer protocol, per-bucket version dirs.
  */
object AggView {

  private def pointerPath(dir: String) = s"$dir/_CURRENT"
  private def versionDir(dir: String, v: Int) = s"$dir/v=$v"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Atomic small-file write — EpochStore's temp + rename(OVERWRITE)
    * through FileContext, the pointer discipline. (A delete-then-rename
    * spelling has a window where NO pointer exists: a crash or racing
    * reader there sees (0, -1) and the next apply silently rebuilds the
    * view from one batch's delta, losing the accumulated totals AND the
    * replayed-batchId ledger.) */
  private def writeAtomic(spark: SparkSession, path: String, body: String): Unit =
    EpochStore.writeAtomic(spark, path, body)

  /** Grace before a superseded version dir is deleted: a reader that
    * resolved the pointer just before rapid successive applies must be
    * able to finish its scan (the EpochStore.retireCompacted posture). */
  val DefaultGcGraceMs: Long = EpochStore.DefaultLeaseGraceMs

  /** (version, lastAppliedBatchId) — (0, -1) before bootstrap. */
  def pointer(spark: SparkSession, dir: String): (Int, Long) = {
    val p = new Path(pointerPath(dir))
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) (0, -1L)
    else {
      val in = fs.open(p)
      val body =
        try new String(in.readAllBytes(), "UTF-8").trim
        finally in.close()
      val parts = body.split("\\s+")
      require(parts.length == 2, s"malformed AggView pointer at $dir: '$body'")
      (parts(0).toInt, parts(1).toLong)
    }
  }

  /** Per-batch partials: one row per key — `n` plus `sum_<c>` per
    * maintained column (LONG-exact: callers pass integral columns, e.g.
    * prices pre-scaled to cents). */
  private def partials(batch: DataFrame, keyCols: Seq[String], sumCols: Seq[String]): DataFrame =
    batch
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sumCols.map(c => sum(col(c).cast("long")).as(s"sum_$c")): _*)

  /** Apply one batch of raw rows. Returns false (and touches nothing)
    * when `batchId` was already applied — the replay no-op. */
  def applyBatch(
      spark: SparkSession,
      dir: String,
      batchId: Long,
      batch: DataFrame,
      keyCols: Seq[String],
      sumCols: Seq[String],
      gcGraceMs: Long = DefaultGcGraceMs
  ): Boolean = {
    val (v, last) = pointer(spark, dir)
    if (batchId <= last) return false
    val delta = partials(batch, keyCols, sumCols)
    val aggNames = "n" +: sumCols.map(c => s"sum_$c")
    val merged =
      if (v == 0) delta
      else {
        val cur = spark.read.parquet(versionDir(dir, v))
        // full-outer merge: batch-new keys enter, untouched keys carry over
        cur
          .select((keyCols.map(col) ++ aggNames.map(c => col(c).as(s"__cur_$c"))): _*)
          .join(delta, keyCols, "full_outer")
          .select(
            (keyCols.map(col) ++ aggNames.map(c =>
              (coalesce(col(s"__cur_$c"), lit(0L)) + coalesce(col(c), lit(0L))).as(c))): _*)
      }
    merged.write.mode(SaveMode.Overwrite).parquet(versionDir(dir, v + 1))
    writeAtomic(spark, pointerPath(dir), s"${v + 1} $batchId")
    // GC-only cosmetics after the one atomic commit: superseded versions,
    // gated on a grace window measured from the SUPERSEDING version's
    // creation (dir mtime of v=o+1 ≈ when v=o stopped being current) so a
    // reader that resolved the pointer just before rapid applies finishes
    // its scan — the retireCompacted discipline. Crash or skip here loses
    // nothing: the next apply sweeps again.
    val fs = fsOf(spark, new Path(dir))
    val now = System.currentTimeMillis()
    (1 until v).foreach { o =>
      val d = new Path(versionDir(dir, o))
      val successor = new Path(versionDir(dir, o + 1))
      if (fs.exists(d) && fs.exists(successor) &&
          (gcGraceMs <= 0 || now - fs.getFileStatus(successor).getModificationTime > gcGraceMs))
        fs.delete(d, true)
    }
    true
  }

  /** The committed totals: one row per key with `n` and `sum_<c>`
    * columns. Fails loudly before bootstrap. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val (v, _) = pointer(spark, dir)
    require(v >= 1, s"no committed AggView at $dir — apply a batch first")
    spark.read.parquet(versionDir(dir, v))
  }

  /** Structured Streaming maintenance: foreachBatch feeds each
    * micro-batch through [[applyBatch]] keyed by Spark's monotone
    * batchId, so checkpoint replay after any crash position re-applies
    * a no-op and the view stays exactly-once. */
  def sink(
      df: DataFrame,
      dir: String,
      keyCols: Seq[String],
      sumCols: Seq[String],
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      gcGraceMs: Long = DefaultGcGraceMs
  ): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch.sparkSession, dir, batchId, batch, keyCols, sumCols, gcGraceMs)
        ()
      }
      .start()
}
