package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** State retention for the blue/green stores. Both versioned stores in
  * this package (CorpusMaintenance's `cluster_map_v<N>`, the IVF
  * base-generation swap in [[StreamingIvfAppend.compact]]) supersede
  * whole directories and never delete — correct for crash-safety, but a
  * continuous loop accumulates dead versions forever. These sweeps are
  * the GC, guarded the same way as `StreamSinks.vacuum`:
  *
  *  - the LIVE version (and anything newer — a concurrent writer's
  *    staged next version) is never touched;
  *  - `keep` trailing versions are preserved below the live one, so a
  *    reader that resolved the pointer just before a flip can finish on
  *    the version it started with;
  *  - an mtime grace window skips anything recently written, whatever
  *    its version number says.
  *
  * All filesystem access goes through the Hadoop FileSystem API —
  * HDFS/S3A/local alike, matching the stores it sweeps.
  */
object Retention {

  /** Sweep superseded versions of a `<dir>/<prefix><v>` blue/green
    * store: delete every version `v <= live - keep` whose directory
    * mtime is older than `graceMs`. Returns the deleted paths.
    *
    * @param live the committed live version (from the store's pointer);
    *             versions >= live - keep + 1 always survive
    * @param keep how many versions to retain INCLUDING the live one
    */
  def retainVersioned(
      spark: SparkSession,
      dir: String,
      prefix: String,
      live: Int,
      keep: Int,
      graceMs: Long = 10 * 60 * 1000L
  ): Seq[String] = {
    require(keep >= 1, s"keep must retain at least the live version, got $keep")
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Seq.empty
    val cutoffVersion = live - keep
    val cutoffTime = System.currentTimeMillis() - graceMs
    fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val name = st.getPath.getName
        if (!name.startsWith(prefix)) None
        else
          name.stripPrefix(prefix).toIntOption match {
            case Some(v) if v <= cutoffVersion && st.getModificationTime < cutoffTime =>
              fs.delete(st.getPath, true)
              Some(st.getPath.toString)
            case _ => None
          }
      }
  }

  /** Sweep superseded `epoch=N` partition dirs of an epoch store after a
    * compaction folded them into a base generation: delete every
    * `<dir>/epoch=N` with N ≤ `cut` whose mtime is older than `graceMs`.
    * The caller passes the COMMITTED base epoch as `cut`
    * ([[EpochStore.retireCompacted]]), so everything deleted is covered
    * by the live base generation; the grace window protects a reader
    * that resolved the pointers just before the flip. Returns the
    * deleted paths. */
  def retainEpochs(
      spark: SparkSession,
      dir: String,
      cut: Int,
      graceMs: Long = 10 * 60 * 1000L
  ): Seq[String] = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Seq.empty
    val cutoffTime = System.currentTimeMillis() - graceMs
    fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val name = st.getPath.getName
        if (!name.startsWith("epoch=")) None
        else
          name.stripPrefix("epoch=").toIntOption match {
            case Some(v) if v <= cut && st.getModificationTime < cutoffTime =>
              fs.delete(st.getPath, true)
              Some(st.getPath.toString)
            case _ => None
          }
      }
  }

  /** Delete one explicitly retired generation directory (an old IVF
    * base or delta after a [[StreamingIvfAppend.compact]] switch-over).
    * The caller asserts it is no longer live; the mtime grace window is
    * the safety net against retiring something still being written.
    * Returns true if deleted, false if skipped (missing or too young).
    */
  def retire(
      spark: SparkSession,
      path: String,
      graceMs: Long = 10 * 60 * 1000L
  ): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) false
    else if (fs.getFileStatus(p).getModificationTime >= System.currentTimeMillis() - graceMs) false
    else fs.delete(p, true)
  }
}
