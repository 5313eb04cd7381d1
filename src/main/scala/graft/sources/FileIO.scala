package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Exact._

/** File source/sink surface (SURVEY §2.2 "Sources / sinks / scans").
  *
  * The reference's entire purpose is landing rows into partitioned,
  * Hive-queryable ORC files (reference RowOrcBucketingSink.java:26,111;
  * README.md:13,17). Here the batch half of that capability is Spark's
  * `write.partitionBy(...).orc(path)` — the bucket directory layout of the
  * reference's `Bucketer` (RowOrcBucketingSink.java:251-254) maps to
  * Hive-style `col=value/` partition dirs, and the columnar
  * `VectorizedRowBatch` staging (RowOrcWriter.java:38,65-119) is built
  * into Spark's OrcFileFormat. The streaming, exactly-once half lives in
  * graft.streaming (FileStreamSink + checkpoint manifest commit) and is
  * exercised by OrcStreamingSinkSpec.
  *
  * Each query here is a full write→re-read round trip, then an aggregate
  * whose oracle runs on the ORIGINAL parquet — so a pass proves byte-level
  * fidelity of the sink+scan pair, not just that files appeared.
  *
  * Scale posture: `partitionBy` on a low-cardinality column (returnflag:
  * 3 values) keeps file counts = partitions × tasks, bounded; the re-read
  * filter on the partition column prunes directories at planning time
  * (visible as PartitionFilters in explain), which at 100 TB is the
  * difference between scanning one partition and the whole table.
  */
object FileIO {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic per-sf scratch root, safe for parallel suites. */
  private def out(dir: String, name: String): String =
    s"/root/repo/tmp/graft_io/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/$name"

  /** Range-clustered sorted write — the data-SKIPPING layout for scan-
    * heavy range predicates (the single-column little sibling of
    * Z-ordering): `repartitionByRange` gives each output FILE a disjoint
    * value range of `sortCols`, and the within-partition sort gives each
    * ROW GROUP a tight min/max — so a later range filter prunes whole
    * files via parquet/ORC statistics instead of decoding them. At
    * 100 TB this turns "scan the table" into "scan the few files whose
    * stats overlap the predicate"; `files` sizes the layout (one range
    * per file). The write itself costs one range-exchange of the data —
    * amortized over every subsequent selective scan.
    *
    * Sort-key type matters (measured, SortedLayoutSpec): DATE and
    * integral keys skip row groups via stats; TIMESTAMP keys do not
    * (the session's default INT96 encoding carries no usable stats, and
    * even INT64-micros timestamp predicates were not converted to
    * parquet filters in this Spark build) — cast event-time keys to
    * date (the natural clustering grain anyway) before sorting. */
  def writeSorted(
      df: DataFrame,
      path: String,
      sortCols: Seq[String],
      files: Int,
      format: String = "parquet"
  ): Unit =
    df.repartitionByRange(files, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .format(format)
      .save(path)

  /** Morton (Z-order) interleave of two 16-bit bucket columns → one
    * 32-bit curve position. Pure builtin bitwise Column arithmetic (the
    * classic mask-cascade bit spread), so the whole computation stays
    * inside whole-stage codegen — no UDF, no custom expression needed.
    * Inputs must already be in [0, 65535]. */
  private[graft] def mortonCode(bx: org.apache.spark.sql.Column, by: org.apache.spark.sql.Column) = {
    def spread(v: org.apache.spark.sql.Column) = {
      // 16 bits → even bit positions of 32: abcd → a_b_c_d
      val s1 = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
      val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
      s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(bx.cast("long")).bitwiseOR(shiftleft(spread(by.cast("long")), 1))
  }

  /** N-dimensional Morton interleave (r16): bit i of dimension d lands
    * at curve position i·n + d — the 2-D mask cascade's general form,
    * spelled as builtin shift/mask/or Column arithmetic (bits·n terms,
    * all inside whole-stage codegen; no UDF). `bits` per dimension, so
    * the curve fits a signed long for bits·n ≤ 63. Dimension 0 owns the
    * LOWEST bit of each group, matching [[mortonCode]] exactly at
    * n = 2, bits = 16 (spec-pinned). */
  private[graft] def mortonCodeN(
      buckets: Seq[org.apache.spark.sql.Column], bits: Int): org.apache.spark.sql.Column = {
    val n = buckets.size
    require(n >= 2, s"mortonCodeN needs >= 2 dimensions, got $n")
    require(bits * n <= 63, s"mortonCodeN: $bits bits x $n dims overflows a signed long")
    buckets.zipWithIndex
      .flatMap { case (v, d) =>
        val vl = v.cast("long")
        (0 until bits).map { i =>
          shiftleft(shiftright(vl, i).bitwiseAND(lit(1L)), i * n + d)
        }
      }
      .reduce(_ bitwiseOR _)
  }

  /** Z-ORDER clustered write — the TWO-dimensional data-skipping layout:
    * each numeric dimension is min/max-scaled to a 16-bit bucket, the
    * buckets interleave into a Morton curve position, and the data is
    * range-partitioned + sorted along the curve. Because the curve
    * preserves locality in BOTH dimensions, every output file covers a
    * small tile of the (dimA, dimB) plane — so a selective range filter
    * on EITHER dimension alone prunes most files via row-group min/max
    * stats, where a single-column sort prunes only its own dimension and
    * scatters the other across every file. The classic lakehouse layout
    * for "filter by either of two keys" tables (e.g. time × tenant) at
    * 100 TB.
    *
    * The per-dimension bounds come from one tiny min/max aggregate
    * (4 scalars — metadata-scale, same class as IVF's centroid collect);
    * degenerate dimensions (min = max) bucket to 0. The curve column is
    * dropped before the write — it exists only to drive the exchange and
    * the sort. */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      dimA: String,
      dimB: String,
      files: Int,
      format: String = "parquet"
  ): Unit =
    zOrdered(df, dimA, dimB, files).write
      .mode(SaveMode.Overwrite)
      .format(format)
      .save(path)

  /** The clustered FRAME behind [[writeZOrdered]] — range-partitioned +
    * sorted along the Morton curve, helper column dropped (the sort
    * survives projection). Exposed so other writers (the in-place
    * streaming-table OPTIMIZE) can land the same layout through their
    * own commit protocol. */
  private[graft] def zOrdered(
      df: DataFrame,
      dimA: String,
      dimB: String,
      files: Int
  ): DataFrame = zOrderedN(df, Seq(dimA, dimB), files)

  /** N-dimensional Z-order write (r16): partition-prune-hostile tables
    * often filter on 3–4 independent keys (tenant × time × entity);
    * two 16-bit dims were a curve-width limit, not a semantic one. Bits
    * per dimension shrink to keep the curve in a signed long
    * (min(16, 63/n)), so pruning resolution per dim degrades gracefully
    * as dims grow — the standard lakehouse trade (4 dims ≈ 15 bits
    * each). Same one metadata-scale min/max collect, same
    * range-partition + sort along the curve, same builtin-only
    * arithmetic. */
  def writeZOrderedN(
      df: DataFrame,
      path: String,
      dims: Seq[String],
      files: Int,
      format: String = "parquet"
  ): Unit =
    zOrderedN(df, dims, files).write
      .mode(SaveMode.Overwrite)
      .format(format)
      .save(path)

  /** @param prefix partition columns to cluster AHEAD of the curve —
    *        the partition-scoped OPTIMIZE shape (r17): range-partitioning
    *        on (prefix..., __z) keeps each Hive partition's rows together
    *        so the `partitionBy` write splits tasks along partition
    *        boundaries and every partition dir's files still cover tight
    *        curve tiles. Empty (the default) is the plain table-wide
    *        curve. */
  private[graft] def zOrderedN(
      df: DataFrame,
      dims: Seq[String],
      files: Int,
      prefix: Seq[String] = Nil
  ): DataFrame = {
    require(dims.size >= 2, s"z-order needs >= 2 dimensions, got ${dims.mkString(",")}")
    val bits = math.min(16, 63 / dims.size)
    val maxBucket = (1L << bits) - 1
    val aggs = dims.flatMap(d => Seq(
      min(col(d)).cast("double").as(s"${d}_min"),
      max(col(d)).cast("double").as(s"${d}_max")))
    val Array(b) = df.agg(aggs.head, aggs.tail: _*).collect()
    def bucket(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      if (hi <= lo) lit(0L)
      else least(lit(maxBucket),
        floor((c.cast("double") - lit(lo)) * lit(maxBucket / (hi - lo))).cast("long"))
    val buckets = dims.zipWithIndex.map { case (d, i) =>
      bucket(col(d), b.getDouble(2 * i), b.getDouble(2 * i + 1))
    }
    val z =
      if (dims.size == 2) mortonCode(buckets(0), buckets(1)) // the 2-D mask-cascade fast path
      else mortonCodeN(buckets, bits)
    val keys = prefix.map(col) :+ col("__z")
    df.withColumn("__z", z)
      .repartitionByRange(files, keys: _*)
      .sortWithinPartitions(keys: _*)
      .drop("__z")
  }

  /** Small-file COMPACTION — the table-maintenance pass every streaming
    * or incremental sink needs: micro-batch commits leave thousands of
    * KB-sized files whose per-file open/footer cost dominates scans at
    * 100 TB. Reads the current layout, sizes the output file count from
    * the ACTUAL on-disk bytes (⌈total/targetFileBytes⌉), and rewrites
    * with `coalesce` — a shuffle-FREE narrow repack (tasks just
    * concatenate input splits; no exchange appears in the plan). Returns
    * (input file count, output file count).
    *
    * Row-order note: coalesce preserves per-input-split order but not a
    * global order — compaction is for append-style tables; re-run
    * writeSorted/writeZOrdered instead when a clustered layout must
    * survive. */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetFileBytes: Long,
      format: String = "parquet"
  ): (Int, Int) = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs
      .listStatus(new org.apache.hadoop.fs.Path(inPath))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read
      .format(format)
      .load(inPath)
      .coalesce(nOut)
      .write
      .mode(SaveMode.Overwrite)
      .format(format)
      .save(outPath)
    (dataFiles.length, nOut)
  }

  /** The table root's absolute filesystem path (scheme-normalized): the
    * base every file identity below is RELATIVE to. */
  private[graft] def tableRootAbs(spark: SparkSession, path: String): String = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.makeQualified(root).toUri.getPath
  }

  /** A file's identity relative to its table root ("part=a/part-....
    * parquet"). Basenames alone are NOT unique in a partitioned table —
    * one write job reuses the same `part-0000N-<jobUUID>` name in EVERY
    * partition directory it writes — so the partition-dir prefix is part
    * of the identity. For RAW filesystem paths (listings): Hadoop
    * Path(String) treats its input as unencoded, so the name comes back
    * verbatim. */
  private def relPath(fileRef: String, rootAbs: String): String =
    new org.apache.hadoop.fs.Path(fileRef).toUri.getPath.stripPrefix(rootAbs + "/")

  /** Same identity, but for `input_file_name()` output — which is a
    * URL-ENCODED URI (Hive-escaped partition dirs double-encode: on-disk
    * `part=t%3Acolon` arrives as `part=t%253Acolon`). One URI decode
    * brings it back to the on-disk name so scan-sourced and
    * listing-sourced identities compare in ONE space. */
  private[graft] def relPathFromScan(fileRef: String, rootAbs: String): String =
    new java.net.URI(fileRef).getPath.stripPrefix(rootAbs + "/")

  /** Spark's `basePath` option must name a DIRECTORY: the table root for
    * a dir-shaped table, its parent for a single-file table. */
  private[graft] def basePathOf(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val q = fs.makeQualified(p)
    if (fs.getFileStatus(q).isDirectory) q.toString else q.getParent.toString
  }

  /** `input_file_name()` URI → a path string Spark's readers resolve to
    * the on-disk file (Path(String) is unencoded, so feed it the DECODED
    * form — the encoded URI would look for a literally-%XX-named file). */
  private def decodeScanPath(fileRef: String): String =
    new org.apache.hadoop.fs.Path(new java.net.URI(fileRef)).toString

  /** Recursive data-file identities (root-relative paths) under a table,
    * skipping underscore/dot-prefixed metadata (sidecars, _SUCCESS,
    * .crc). The staleness fingerprint [[bloomPointLookup]] validates
    * against. */
  private[graft] def dataFileNames(spark: SparkSession, path: String): Set[String] =
    dataFilePaths(spark, path).keySet

  /** The GENERATION identity set of a table's current data files — what
    * staleness fingerprints compare against (see [[DataFileId]]). */
  private[graft] def dataFileIdentitySet(spark: SparkSession, path: String): Set[String] =
    dataFileIds(spark, path).map(_.identity).toSet

  /** The bloom sidecar's [[Sidecar]] root: version dirs + the single
    * `_CURRENT` pointer carrying the live version AND the build-time
    * table fingerprint (every data-file identity present when the index
    * was built, INCLUDING files whose keys were all null and so carry no
    * bloom row). [[bloomPointLookup]] refuses to prune against a listing
    * that no longer matches the committed fingerprint — a rewritten
    * table would otherwise be pruned against vanished file names with no
    * error (stale-sidecar hazard). Version + fingerprint commit in ONE
    * atomic pointer flip, so a crash mid-(re)build leaves the OLD index
    * serving consistently — never a fingerprint-less or half-swapped
    * sidecar. */
  private def bloomRoot(path: String, keyCol: String) = s"$path/_bloom_$keyCol"

  private def bloomCurrent(spark: SparkSession, path: String, keyCol: String): Sidecar.Current =
    Sidecar.current(spark, bloomRoot(path, keyCol)).getOrElse(
      throw new IllegalArgumentException(
        s"no committed bloom sidecar at ${bloomRoot(path, keyCol)} — build the index " +
          "(buildBloomIndex) before point lookups"))

  /** The committed sidecar rows (file, bloom) — the CURRENT version only
    * (older versions may linger inside the GC grace window). */
  def readBloomSidecar(spark: SparkSession, path: String, keyCol: String): DataFrame =
    spark.read.parquet(bloomCurrent(spark, path, keyCol).dataDir)

  /** One data file's three identities: the root-relative path (the
    * within-listing key — unique at any instant), the full path (what a
    * scan reads), and the GENERATION identity `rel#mtime#len` (what
    * staleness fingerprints store — a file REWRITTEN or deleted-then-
    * recreated at the same path gets a new generation, so carried-over
    * index rows for the old bytes can never silently serve: the
    * fingerprint compare flags it as gone+fresh instead).
    *
    * Granularity caveat: mtime resolution is filesystem-dependent (1 s
    * on many local filesystems and object stores), so a SAME-LENGTH
    * in-place rewrite landing within one mtime tick of the original
    * keeps the old generation and stale index rows would serve for the
    * new bytes. This engine's own writers never hit the window — every
    * rewrite path (upsertByKey, Sidecar versions, the streaming sinks)
    * writes job-UUID-fresh file NAMES, which changes `rel` and so the
    * generation unconditionally. The caveat exists for FOREIGN writers
    * that mutate parquet bytes in place at the same path+length within
    * one tick; if that is a real workload, strengthen the identity with
    * a content token (e.g. the parquet footer checksum) at listing time
    * — a deliberate listing-cost trade this build does not pay. */
  private[graft] final case class DataFileId(rel: String, full: String, identity: String)

  /** Recursive data-file listing with all three identities, skipping
    * underscore/dot-prefixed metadata (sidecars, _SUCCESS, .crc). */
  private[graft] def dataFileIds(spark: SparkSession, path: String): Seq[DataFileId] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootAbs = tableRootAbs(spark, path)
    def hidden(n: String) = n.startsWith("_") || n.startsWith(".")
    def walk(p: org.apache.hadoop.fs.Path): Iterator[DataFileId] =
      fs.listStatus(p).iterator.flatMap { s =>
        if (hidden(s.getPath.getName)) Iterator.empty
        else if (s.isDirectory) walk(s.getPath)
        else {
          val rel = relPath(s.getPath.toString, rootAbs)
          Iterator.single(
            DataFileId(rel, s.getPath.toString, s"$rel#${s.getModificationTime}#${s.getLen}"))
        }
      }
    walk(root).toSeq
  }

  /** Recursive data-file FULL paths keyed by root-relative identity,
    * same hidden-skip rule as [[dataFileNames]]. */
  private[graft] def dataFilePaths(spark: SparkSession, path: String): Map[String, String] =
    dataFileIds(spark, path).map(id => id.rel -> id.full).toMap

  /** URI path → byte length of every data file under `path` in ONE
    * recursive listing — replaces per-file driver getFileStatus loops
    * (r19: one listing call per directory instead of one RPC per FILE;
    * on an object store the per-file form is O(files) round trips).
    * Callers sum over their OWN file set (e.g. a read's `inputFiles`,
    * which a _spark_metadata manifest may restrict below the listing),
    * so the sized byte total is unchanged vs the per-file form. Same
    * hidden-skip rule as [[dataFileIds]]. */
  private[graft] def dataFileLenByPath(spark: SparkSession, path: String): Map[String, Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hidden(n: String) = n.startsWith("_") || n.startsWith(".")
    def walk(p: org.apache.hadoop.fs.Path): Iterator[(String, Long)] =
      fs.listStatus(p).iterator.flatMap { s =>
        if (hidden(s.getPath.getName)) Iterator.empty
        else if (s.isDirectory) walk(s.getPath)
        else Iterator.single((s.getPath.toUri.getPath, s.getLen))
      }
    walk(root).toMap
  }

  /** Total bytes of `df.inputFiles` restricted to `within`, via one
    * recursive listing (see [[dataFileLenByPath]]). `filter` applies to
    * the URI-decoded path — the raw on-disk form, so Hive-escaped
    * partition segments compare in one space. */
  private[graft] def inputFileBytes(
      spark: SparkSession,
      df: DataFrame,
      within: String,
      filter: String => Boolean = _ => true): Long = {
    val lens = dataFileLenByPath(spark, within)
    df.inputFiles.iterator
      .map(f => new java.net.URI(f).getPath)
      .filter(filter)
      .map(p => lens.getOrElse(p,
        new org.apache.hadoop.fs.Path(within).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
          .getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen))
      .sum
  }

  /** INCREMENTAL sidecar maintenance — O(changed files), not O(table):
    * files that vanished since the last (re)build drop out of the
    * sidecar, files that APPEARED are scanned and sketched, and every
    * other file's bloom bytes carry over untouched — after an append (or
    * a partition-scoped [[upsertByKey]], which rewrites only touched
    * partitions' files) the refresh costs one scan of the NEW files
    * instead of the table. The refreshed rows land in a NEW [[Sidecar]]
    * version dir and become visible — together with the new fingerprint
    * — in one atomic pointer flip, so a crash anywhere mid-update leaves
    * the OLD sidecar serving (lookups correct for the old listing,
    * loudly STALE for the new one) — never a half-swapped sidecar or a
    * silently wrong prune.
    *
    * @return (filesAdded, filesRemoved) */
  def updateBloomIndex(
      spark: SparkSession,
      path: String,
      keyCol: String,
      fpp: Double = 0.01,
      format: String = "parquet"
  ): (Int, Int) = {
    import org.apache.spark.util.sketch.BloomFilter
    val cur = bloomCurrent(spark, path, keyCol) // loud when absent
    val indexed = cur.fingerprint
    val ids = dataFileIds(spark, path)
    // GENERATION identities (rel#mtime#len): a file rewritten or
    // deleted-then-recreated at the SAME path shows up as gone+fresh, so
    // its old bloom rows are dropped and the new bytes rescanned — the
    // path-only compare would have silently kept stale rows
    val gone = indexed -- ids.map(_.identity)
    val fresh = ids.filterNot(id => indexed.contains(id.identity)).sortBy(_.rel)
    if (gone.isEmpty && fresh.isEmpty) return (0, 0)
    val rootAbs = tableRootAbs(spark, path)
    val relUdf = udf((f: String) => relPathFromScan(f, rootAbs))
    // carried-over rows = files whose GENERATION is still indexed: drop
    // vanished identities AND rescanned rels (an unchanged file's rel
    // maps to exactly one live generation)
    val keepRels = ids.filter(id => indexed.contains(id.identity)).map(_.rel)
    val keep = spark.read.parquet(cur.dataDir)
      .filter(relUdf(col("file")).isin(keepRels: _*))
    val freshRows =
      if (fresh.isEmpty) keep.limit(0)
      else {
        val rows = spark.read
          .format(format)
          .option("basePath", basePathOf(spark, path))
          .load(fresh.map(_.full): _*)
          .select(input_file_name().as("f"), col(keyCol).cast("long").as("k"))
          .filter(col("k").isNotNull)
        val Array(stats) = rows.groupBy(col("f")).count().agg(max("count")).collect()
        if (stats.isNullAt(0)) keep.limit(0) // all-null keys: fingerprint-only
        else {
          val perFileCap = math.max(64L, stats.getLong(0) * 2)
          spark
            .createDataFrame(rows.rdd
              .map(r => (r.getString(0), r.getLong(1)))
              .aggregateByKey(BloomFilter.create(perFileCap, fpp))(
                (bf, k) => { bf.putLong(k); bf },
                (a, b) => { a.mergeInPlace(b); a })
              .map { case (f, bf) =>
                val bos = new java.io.ByteArrayOutputStream()
                bf.writeTo(bos)
                (f, bos.toByteArray)
              })
            .toDF("file", "bloom")
        }
      }
    val (vNew, stageDir) = Sidecar.nextStage(spark, bloomRoot(path, keyCol))
    keep.unionByName(freshRows).write.mode(SaveMode.Overwrite).parquet(stageDir)
    Sidecar.commit(spark, bloomRoot(path, keyCol), vNew, ids.map(_.identity).toSet)
    (fresh.size, gone.size)
  }

  /** Build-or-refresh in one call — the idempotent spelling streaming
    * maintenance hooks need ([[graft.streaming.StreamSinks
    * .maintainedParquetSink]]): first batch bootstraps the sidecar,
    * every later batch pays O(changed files). Safe to call redundantly
    * (an unchanged listing returns (0, 0) without touching anything).
    * @return (filesAdded, filesRemoved) — the full build reports
    *         (snapshotSize, 0) */
  def refreshBloomIndex(
      spark: SparkSession,
      path: String,
      keyCol: String,
      fpp: Double = 0.01,
      format: String = "parquet"
  ): (Int, Int) =
    if (Sidecar.current(spark, bloomRoot(path, keyCol)).isEmpty)
      (buildBloomIndex(spark, path, keyCol, fpp, format), 0)
    else updateBloomIndex(spark, path, keyCol, fpp, format)

  /** BLOOM-FILTER FILE-SKIPPING INDEX (table maintenance — the
    * Delta/Iceberg bloom sidecar): point lookups on a NON-clustering
    * key normally open every file (min/max row-group stats are useless
    * when the key is scattered); a per-file Bloom filter lets the
    * planner drop files that definitely lack the key — false positives
    * cost one wasted file read, false negatives are impossible.
    *
    * Index build: one pass over the table keyed by `input_file_name`,
    * per-file sketches merged with `aggregateByKey` — sketch-merge is
    * genuine per-partition imperative logic (the RDD-last-resort
    * carve-out): the shuffle carries one PARTIAL BLOOM per (partition,
    * file), never data rows. The sidecar lands under
    * `_bloom_<key>/` — an underscore-prefixed dir Spark's readers
    * already hide from table scans (the `_spark_metadata` convention).
    *
    * Scale posture: the sidecar is one row per data file. The lookup
    * below collects it (justified: metadata-scale by construction, the
    * same class as the manifest read). At millions of files,
    * partition the sidecar by the table's partition columns and prune
    * it before the collect — or join the candidate file list instead
    * of collecting — same layout, no interface change.
    *
    * @return number of files indexed
    *
    * (Full rebuild is O(table); after appends prefer [[updateBloomIndex]]
    * — O(new files).) */
  def buildBloomIndex(
      spark: SparkSession,
      path: String,
      keyCol: String,
      fpp: Double = 0.01,
      format: String = "parquet"
  ): Int = {
    import org.apache.spark.util.sketch.BloomFilter
    // ONE listing is the snapshot for BOTH the sketch scan and the
    // fingerprint — the scan reads these explicit files (basePath keeps
    // partition columns inferred) and the fingerprint records exactly
    // them, so a file appended concurrently can never be fingerprinted
    // without a bloom row (it shows up as a LOUD staleness mismatch at
    // lookup time instead)
    val snapshot = dataFileIds(spark, path)
    val snapIds = snapshot.map(_.identity).toSet
    val (vNew, stageDir) = Sidecar.nextStage(spark, bloomRoot(path, keyCol))
    // empty table, or all keys null after the long cast: an empty
    // sidecar is the correct index — every file definitely lacks every
    // key. (Null keys are EXCLUDED from the sketches generally: a bloom
    // cannot carry null, point lookups take a concrete Long, and
    // dropping nulls cannot false-negative any non-null probe.)
    def commitEmpty(): Int = {
      spark
        .createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("file", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("bloom", org.apache.spark.sql.types.BinaryType))))
        .write
        .mode(SaveMode.Overwrite)
        .parquet(stageDir)
      Sidecar.commit(spark, bloomRoot(path, keyCol), vNew, snapIds)
      0
    }
    if (snapshot.isEmpty) return commitEmpty()
    val rows = spark.read
      .format(format)
      .option("basePath", basePathOf(spark, path))
      .load(snapshot.map(_.full).sorted: _*)
      .select(input_file_name().as("f"), col(keyCol).cast("long").as("k"))
      .filter(col("k").isNotNull)
    // expected items per file: one metadata-scale count (2× headroom
    // keeps fpp honest on skewed file sizes)
    val stats = rows.groupBy(col("f")).count().agg(max("count"), count(lit(1))).collect().head
    if (stats.isNullAt(0)) return commitEmpty()
    val perFileCap = math.max(64L, stats.getLong(0) * 2)
    val nFiles = stats.getLong(1).toInt
    val sidecar = rows.rdd
      .map(r => (r.getString(0), r.getLong(1)))
      .aggregateByKey(BloomFilter.create(perFileCap, fpp))(
        (bf, k) => { bf.putLong(k); bf },
        (a, b) => { a.mergeInPlace(b); a })
      .map { case (f, bf) =>
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        (f, bos.toByteArray)
      }
    spark
      .createDataFrame(sidecar)
      .toDF("file", "bloom")
      .write
      .mode(SaveMode.Overwrite)
      .parquet(stageDir)
    Sidecar.commit(spark, bloomRoot(path, keyCol), vNew, snapIds)
    nFiles
  }

  /** Point lookup through the bloom sidecar: returns (matching rows,
    * candidate file count, total file count) — the caller's pruning
    * telemetry. Results are EXACTLY the full-scan filter's (a bloom
    * has no false negatives); only the file set read differs.
    *
    * Staleness gate: the committed fingerprint (data-file identities at
    * build time, carried IN the sidecar's atomic `_CURRENT` pointer) must
    * equal the CURRENT listing — a table rewritten after indexing would
    * otherwise be pruned against vanished file names with no error.
    * Mismatch fails loudly: rebuild the index.
    *
    * `collectSidecar = true` (default) deserializes the blooms on the
    * driver — metadata-scale when files number in the thousands. At
    * MILLIONS of files the blooms themselves dwarf driver memory: set it
    * false and the probe runs as a distributed filter over the sidecar
    * (each executor deserializes only its partition's blooms); only the
    * MATCHING file names — bounded by the true candidate count — come
    * back to the driver to plan the scan. Identical results either way
    * (BloomIndexSpec pins it). */
  def bloomPointLookup(
      spark: SparkSession,
      path: String,
      keyCol: String,
      key: Long,
      format: String = "parquet",
      collectSidecar: Boolean = true
  ): (DataFrame, Int, Int) = {
    import org.apache.spark.util.sketch.BloomFilter
    val current = dataFileIdentitySet(spark, path)
    val cur = bloomCurrent(spark, path, keyCol)
    val indexed = cur.fingerprint
    if (current != indexed) {
      val gone = indexed -- current
      val fresh = current -- indexed
      throw new IllegalStateException(
        s"bloom sidecar at $path/_bloom_$keyCol is STALE: the table changed after indexing " +
          s"(${gone.size} indexed file(s) vanished, ${fresh.size} unindexed file(s) appeared" +
          (gone.take(3) ++ fresh.take(3)).mkString(": ", ", ", "") +
          ") — pruning against it would be silently wrong; rebuild with buildBloomIndex")
    }
    val sidecarDf = spark.read.parquet(cur.dataDir)
    val (candidates, total) =
      if (collectSidecar) {
        val entries = sidecarDf.collect()
        (entries.filter { r =>
          BloomFilter
            .readFrom(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
            .mightContainLong(key)
        }.map(_.getAs[String]("file")),
          entries.length)
      } else {
        // distributed spelling: blooms stay on executors; the driver sees
        // only matching file names + one count
        val probe = udf { (b: Array[Byte]) =>
          BloomFilter.readFrom(new java.io.ByteArrayInputStream(b)).mightContainLong(key)
        }
        (sidecarDf.filter(probe(col("bloom"))).select("file").collect().map(_.getString(0)),
          sidecarDf.count().toInt)
      }
    val result =
      if (candidates.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          spark.read.format(format).load(path).schema)
      else
        spark.read
          .format(format)
          .load(candidates.map(decodeScanPath).toIndexedSeq: _*)
          .filter(col(keyCol).cast("long") === key)
    (result, candidates.length, total)
  }

  /** BUCKETED TABLE write — the canonical shuffle-ELIMINATION layout
    * for repeated big-big joins at 100 TB: both sides hash-bucketed
    * into the same bucket count on the join key (`bucketBy`) and
    * sorted within buckets (`sortBy`), so a sort-merge join reads
    * bucket i against bucket i directly — NO Exchange, NO per-query
    * Sort, on EVERY subsequent join against the table. One write-time
    * shuffle amortized over every downstream join, vs `repartition`
    * which pays it per query. Bucketing requires a catalog table
    * (the bucket spec lives in table metadata — a bare parquet path
    * cannot carry it), which is also the reference's end state:
    * committed files queryable by NAME. */
  def writeBucketedTable(
      df: DataFrame,
      table: String,
      keyCol: String,
      buckets: Int,
      format: String = "parquet"
  ): Unit = {
    val spark = df.sparkSession
    // Overwrite replaces a REGISTERED table, but an orphan managed-table
    // directory left by a previous SESSION (in-memory catalog gone, dir
    // still on disk) hard-fails creation — drop both, idempotently.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(warehouse)) fs.delete(warehouse, true)
    df.write
      .mode(SaveMode.Overwrite)
      .format(format)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .saveAsTable(table)
  }

  /** What [[upsertByKey]] rewrote. */
  final case class UpsertReport(partitionsRewritten: Int, nUpserts: Long)

  /** Partition-scoped MERGE/upsert into a Hive-partitioned table — the
    * lakehouse mutation primitive, without a table format: update rows
    * REPLACE base rows sharing their key, new keys append, and ONLY the
    * partitions the updates touch are rewritten. At 100 TB this is the
    * difference between rewriting a few date partitions and the table.
    *
    * Mechanics: the updates' distinct partition values (METADATA-scale —
    * an upsert batch touches few partitions; same driver-side class as
    * IVF's probed-cluster ids) become a planning-time partition filter
    * on the base scan; affected base rows anti-join the update keys
    * (broadcast when small) and union the updates; the write-back uses
    * DYNAMIC partition overwrite, which replaces exactly the partitions
    * present in the merged frame — untouched partitions' files are never
    * read or written (spec-pinned byte-identical).
    *
    * Contract: `updates` must be unique per key (enforced), must carry
    * the partition column, and the partition value of a key must be
    * STABLE (a key never moves partitions) — the usual warehouse layout
    * (partition derived from immutable attributes: creation date, id
    * hash). A moving key would strand its old row in an untouched
    * partition. `moveGuardKey` DETECTS that: name a bloom-indexed key
    * column ([[buildBloomIndex]]) and every update key is probed against
    * the blooms of the files OUTSIDE the touched partitions before
    * anything is written — a hit fails loudly (a bloom has no false
    * negatives, so silence proves no key moved; a false positive aborts
    * a valid upsert ~fpp of the time, the safe direction). The guard
    * requires a FRESH sidecar (the fingerprint gate) and the upsert's
    * own rewrite staleness it — rebuild the index after a guarded
    * upsert, or the next guard refuses loudly rather than probing
    * vanished files.
    */
  def upsertByKey(
      spark: SparkSession,
      basePath: String,
      updates: DataFrame,
      keyCols: Seq[String],
      partitionCol: String,
      format: String = "parquet",
      moveGuardKey: Option[String] = None
  ): UpsertReport = {
    require(keyCols.nonEmpty, "upsertByKey needs at least one key column")
    require(updates.columns.contains(partitionCol),
      s"updates must carry the partition column '$partitionCol'")
    // Row count + per-key uniqueness in ONE pass (r19 — was count() plus
    // distinct().count(), two full evaluations of the updates subtree):
    // group by key, then a metadata-scale rollup gives the total (sum)
    // and the duplicate flag (max > 1). groupBy groups NULL keys exactly
    // like distinct() did, so the check's semantics are unchanged.
    val sizeRow = updates
      .groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(sum(col("__c")).as("n"), max(col("__c")).as("mx"))
      .collect()(0)
    val nUpd = if (sizeRow.isNullAt(0)) 0L else sizeRow.getLong(0)
    require(sizeRow.isNullAt(1) || sizeRow.getLong(1) <= 1L,
      "updates must be unique per key — collapse them (e.g. keep-latest) before the upsert")
    val partVals = updates.select(col(partitionCol)).distinct().collect().map(_.get(0))
    moveGuardKey.foreach { kc =>
      require(keyCols.contains(kc),
        s"moveGuardKey '$kc' must be one of the upsert's key columns ${keyCols.mkString(",")}")
      // fingerprint gate: probing a stale sidecar would be silently wrong
      val current = dataFileIdentitySet(spark, basePath)
      val sidecarCur = bloomCurrent(spark, basePath, kc)
      require(current == sidecarCur.fingerprint,
        s"move guard needs a FRESH bloom sidecar at $basePath/_bloom_$kc — the table changed " +
          "after indexing; rebuild with buildBloomIndex before the guarded upsert")
      // untouched files = sidecar entries whose path lies outside every
      // touched partition directory. Partition values are rendered with
      // Spark's OWN Hive path escaping (space, ':', '%', … become %XX on
      // disk) — a raw toString would fail to match the escaped dir name,
      // probe the touched partition's own files, and spuriously abort a
      // valid upsert
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
      val touchedSegs = partVals.map { v =>
        val render =
          if (v == null) "__HIVE_DEFAULT_PARTITION__" else escapePathName(v.toString)
        s"/${escapePathName(partitionCol)}=$render/"
      }
      val keys = updates.select(col(kc).cast("long")).na.drop().distinct()
        .collect().map(_.getLong(0))
      import org.apache.spark.util.sketch.BloomFilter
      // executors deserialize each untouched bloom ONCE and probe the full
      // (closure-captured, uniqueness-bounded) key batch against it
      val probe = udf { (b: Array[Byte]) =>
        val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))
        keys.filter(bf.mightContainLong).toSeq
      }
      // sidecar paths come from input_file_name = URI-encoded ('%'→'%25');
      // decode to the raw on-disk path so the escaped segments compare in
      // ONE space (the relPathFromScan discipline)
      val decodePath = udf((f: String) => new java.net.URI(f).getPath)
      val moved = spark.read.parquet(sidecarCur.dataDir)
        .filter(!touchedSegs.map(seg => decodePath(col("file")).contains(seg))
          .reduceOption(_ || _)
          .getOrElse(lit(false)))
        .select(col("file"), explode(probe(col("bloom"))).as("key"))
        .limit(10)
        .collect()
      if (moved.nonEmpty)
        throw new IllegalStateException(
          s"upsertByKey move guard: update key(s) ${moved.map(_.getLong(1)).distinct.mkString(",")} " +
            s"probably already live OUTSIDE the touched $partitionCol partitions (bloom hits in " +
            s"e.g. ${moved.head.getString(0)}) — applying this upsert would strand their old " +
            "rows. Fix the updates' partition values (keys must not move partitions), or " +
            "delete-and-reinsert explicitly")
    }
    val base = spark.read.format(format).load(basePath)
    val affectedBase = base.filter(col(partitionCol).isin(partVals: _*))
    // size-gated broadcast on the MEASURED row count (already paid by the
    // uniqueness check): typical upsert batches broadcast; a bulk
    // backfill falls back to the shuffle anti-join
    val keyDf = updates.select(keyCols.map(col): _*)
    val keySide = if (nUpd <= 1000000L) broadcast(keyDf) else keyDf
    val survivors = affectedBase.join(keySide, keyCols, "left_anti")
    survivors
      .unionByName(updates.select(base.columns.map(col): _*))
      .write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .format(format)
      .partitionBy(partitionCol)
      .save(basePath)
    UpsertReport(partVals.length, nUpd)
  }

  /** Streaming CDC APPLY: every micro-batch [[upsertByKey]]s into the
    * partitioned table — the classic "apply the change stream to the
    * warehouse table" loop, composed from the batch primitive.
    *
    * Exactly-once BY IDEMPOTENCE: foreachBatch delivery is
    * at-least-once, and re-applying an upsert batch is a no-op
    * (TableUpsertSpec pins it), so a crash-replayed batch converges to
    * the same table — the same argument the maintenance loops make via
    * their epoch pointers, here for free from the upsert's semantics.
    *
    * In-batch collapse: a CDC stream can carry several versions of one
    * key per micro-batch; `versionCol` (when set) keeps the row with the
    * HIGHEST version per key (deterministic; ties broken by the max
    * struct comparison across remaining columns). Without it, the batch
    * must already be unique per key — [[upsertByKey]] enforces. */
  def upsertSink(
      stream: DataFrame,
      basePath: String,
      keyCols: Seq[String],
      partitionCol: String,
      checkpoint: String,
      versionCol: Option[String] = None,
      format: String = "parquet",
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow()
  ): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, _: Long) =>
        val collapsed = versionCol match {
          case None => b
          case Some(v) =>
            val others = b.columns.filterNot(keyCols.contains)
            b.groupBy(keyCols.map(col): _*)
              .agg(max_by(struct(others.map(col): _*), col(v)).as("__r"))
              .select((keyCols.map(col) ++ others.map(c => col(s"__r.$c").as(c))): _*)
        }
        if (!collapsed.isEmpty) {
          val hp = new org.apache.hadoop.fs.Path(basePath)
          val fs = hp.getFileSystem(b.sparkSession.sparkContext.hadoopConfiguration)
          if (!fs.exists(hp)) {
            // first batch bootstraps the table (replay-safe: a re-run of
            // the same batch finds the path and upserts — a no-op)
            collapsed.write.mode(SaveMode.Overwrite)
              .format(format).partitionBy(partitionCol).save(basePath)
          } else {
            upsertByKey(b.sparkSession, basePath, collapsed, keyCols, partitionCol, format)
            ()
          }
        }
      }
      .start()

  val queries: Map[String, Q] = Map(
    // Batch partitioned ORC sink (reference parity R5+R7) + ORC scan +
    // partition pruning on the re-read.
    "orc_sink_roundtrip" -> { (spark, dir) =>
      val p = out(dir, "lineitem_orc")
      // The fixture parquet is one row group → one scan task, so without
      // a repartition the whole zlib-compressed write runs single-task
      // (measured r18: ~1.5 s serial). Hash on (partition col, order key)
      // spreads the write across the session's parallelism while keeping
      // each (flag, key) group in one task — the standard clustered-write
      // trade (files ≈ tasks × live partition values per task).
      val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
      Tables
        .lineitem(spark, dir)
        .repartition(parts, col("l_returnflag"), col("l_orderkey"))
        .write
        .mode(SaveMode.Overwrite)
        .option("compression", "zlib") // the reference's ORC default codec (orc-core CompressionKind.ZLIB)
        .partitionBy("l_returnflag")
        .orc(p)
      spark.read
        .orc(p)
        .filter(col("l_returnflag") =!= "N") // prunes partition dirs
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_extendedprice")).as("sum_price"),
          dsum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // NESTED-type ORC round trip — the declared extension over the
    // reference's flat-only writer (RowOrcWriter.java:107-108 throws on
    // non-scalar types; SURVEY §1.4 "we ADD: ArrayType, MapType, nested
    // StructType"): write array<float>, map<string,string>, and a
    // doubly-nested struct (struct containing a struct AND the array)
    // through the partitioned zlib ORC sink, re-read with a
    // partition-pruning filter, and aggregate every nested field back to
    // scalars the DuckDB oracle reproduces from the ORIGINAL parquet — a
    // pass proves byte-level fidelity of each nested encoder/decoder pair.
    "orc_nested_roundtrip" -> { (spark, dir) =>
      val p = out(dir, "embeddings_nested_orc")
      Tables
        .embeddings(spark, dir)
        .select(
          col("vec_id"),
          col("label"),
          col("embedding"),
          map(
            lit("lbl"), col("label").cast("string"),
            lit("id"), col("vec_id").cast("string")
          ).as("props"),
          struct(
            col("vec_id").as("id"),
            struct(col("label").as("l"), size(col("embedding")).as("dim")).as("meta"),
            col("embedding").as("vec")
          ).as("rec")
        )
        .write
        .mode(SaveMode.Overwrite)
        .option("compression", "zlib")
        .partitionBy("label")
        .orc(p)
      spark.read
        .orc(p)
        .filter(col("label") <= 7) // prunes partition dirs
        .select(
          col("label"),
          element_at(col("embedding"), 1).cast("double").as("e1"),
          element_at(col("rec.vec"), 2).cast("double").as("e2"),
          col("rec.id").as("rid"),
          col("rec.meta.dim").as("dim"),
          when(
            element_at(col("props"), "id") === col("vec_id").cast("string") &&
              element_at(col("props"), "lbl") === col("rec.meta.l").cast("string"),
            1L
          ).otherwise(0L).as("map_ok")
        )
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n"),
          davg(col("e1")).as("avg_e1"),   // array<float> through ORC
          davg(col("e2")).as("avg_e2"),   // array nested INSIDE the struct
          sum(col("rid")).as("sum_id"),   // struct field
          max(col("dim")).as("dim"),      // struct-in-struct field
          sum(col("map_ok")).as("n_map_ok") // map<string,string> lookups
        )
        .orderBy(col("label"))
    },

    // CSV sink + schema-driven CSV scan (reference R2 generalized: its
    // demo pipeline parses CSV lines into typed rows,
    // OrcSinkTest.java:32-36). Round trip covers string/long/double/
    // timestamp lexical fidelity.
    "csv_scan_roundtrip" -> { (spark, dir) =>
      val p = out(dir, "orders_csv")
      val src = Tables.orders(spark, dir)
      src.write
        .mode(SaveMode.Overwrite)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(p)
      spark.read
        .schema(src.schema)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .csv(p)
        .groupBy(col("o_orderstatus"))
        .agg(
          dsum(col("o_totalprice")).as("sum_price"),
          max(col("o_orderdate")).as("max_date"),
          count(lit(1)).as("n")
        )
        .orderBy(col("o_orderstatus"))
    },

    // JSON-lines sink + scan: same fidelity contract as CSV.
    "json_scan_roundtrip" -> { (spark, dir) =>
      val p = out(dir, "customer_json")
      val src = Tables.customer(spark, dir)
      src.write.mode(SaveMode.Overwrite).json(p)
      spark.read
        .schema(src.schema)
        .json(p)
        .groupBy(col("c_mktsegment"))
        .agg(
          dsum(col("c_acctbal")).as("sum_bal"),
          countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n")
        )
        .orderBy(col("c_mktsegment"))
    },

    // Pluggable-Bucketer parity (reference RowOrcBucketingSink.java:41,
    // 111,251-254): an ARBITRARY row expression — not just a column or a
    // date format — routes each row to its bucket directory, here
    // `<event_type>_<value tier>`. The re-read filter is on the derived
    // bucket column, so pruning happens at directory-listing time even
    // though the bucket is a computed expression; the oracle recomputes
    // the same expression from the ORIGINAL parquet, so a pass proves
    // the routing expression and the layout agree row-for-row.
    "orc_bucketer_roundtrip" -> { (spark, dir) =>
      val p = out(dir, "events_bucketed_orc")
      val bucketExpr = concat(
        col("event_type"), lit("_"),
        when(col("value") < 50, lit("small")).otherwise(lit("big")))
      graft.streaming.StreamSinks
        .withBucket(Tables.events(spark, dir), "bucket", bucketExpr)
        .write
        .mode(SaveMode.Overwrite)
        .option("compression", "zlib")
        .partitionBy("bucket")
        .orc(p)
      spark.read
        .orc(p)
        .filter(col("bucket").endsWith("_big")) // prunes bucket dirs
        .groupBy(col("bucket"))
        .agg(
          dsum(col("value")).as("sum_value"),
          count(lit(1)).as("n")
        )
        .orderBy(col("bucket"))
    },

    // CATALOG-REGISTERED sink table — the reference's actual end state
    // (committed files become a Hive-queryable warehouse TABLE, reference
    // README.md:13,17, OrcSinkTest.java:23), end-to-end: the events
    // fixture streams through the exactly-once partitioned ORC sink
    // (file source → FileStreamSink manifest commit), the directory is
    // PROMOTED to plain-listing visibility, registered as a partitioned
    // external table in spark_catalog, and the query reads it BY NAME —
    // `spark.table(...)` with a partition filter the catalog prunes at
    // planning time. The oracle recomputes from the ORIGINAL parquet, so
    // a pass proves the whole stream→commit→promote→register→SQL chain
    // loses and invents nothing.
    "catalog_sink_table" -> { (spark, dir) =>
      val p = out(dir, "events_catalog_orc")
      val ck = out(dir, "events_catalog_ckpt")
      val landing = out(dir, "events_catalog_src")
      // the gate owns these scratch dirs: rebuild fresh each run
      Seq(p, ck, landing).foreach { d =>
        val hp = new org.apache.hadoop.fs.Path(d)
        val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(hp)) fs.delete(hp, true)
      }
      // stage the fixture into a LANDING directory (the file stream
      // source consumes directories, the real ingestion shape; the ts
      // column is skipped — its vintage dispatch lives in Tables.events
      // and is irrelevant to the table-registration contract under test)
      spark.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
        .write.mode(SaveMode.Overwrite).parquet(landing)
      val src = spark.readStream
        .schema(spark.read.parquet(landing).schema)
        .parquet(landing)
      val q = graft.streaming.StreamSinks.orcSink(src, p, ck, Seq("event_type"))
      q.awaitTermination()
      graft.streaming.StreamSinks.promote(spark, p, "orc")
      graft.streaming.StreamSinks.registerTable(
        spark, "graft_sink_events", p, "orc", Seq("event_type"))
      spark.table("graft_sink_events")
        .filter(col("event_type") =!= "view") // catalog partition pruning
        .groupBy(col("event_type"))
        .agg(
          dsum(col("value")).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("event_id")).as("sum_id"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },

    // SCHEMA EVOLUTION on a live table — the other mutation every
    // long-lived warehouse table suffers: a producer starts shipping an
    // extra column mid-stream. Batch 1 lands WITHOUT `c_nationkey`,
    // batch 2 WITH it; a `mergeSchema` read serves the union schema with
    // nulls for the legacy files, and the aggregate separates legacy
    // from evolved rows. The oracle recomputes from the original parquet
    // (which always had the column) using the SAME even/odd split, so a
    // pass proves no row, value, or null was invented by the merge.
    "schema_evolution" -> { (spark, dir) =>
      val p = out(dir, "customer_evolve")
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) fs.delete(hp, true)
      val src = Tables.customer(spark, dir)
      src.filter(pmod(col("c_custkey"), lit(2)) === 0)
        .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
        .write.mode(SaveMode.Overwrite).parquet(p)
      src.filter(pmod(col("c_custkey"), lit(2)) === 1)
        .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"), col("c_nationkey"))
        .write.mode(SaveMode.Append).parquet(p)
      spark.read
        .option("mergeSchema", "true")
        .parquet(p)
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("c_nationkey").isNull, 1L).otherwise(0L)).as("n_legacy"),
          dsum(col("c_acctbal")).as("sum_bal"),
          sum(coalesce(col("c_nationkey"), lit(0L))).as("sum_nation"))
        .orderBy(col("c_mktsegment"))
    },

    // Partition-scoped MERGE/upsert (upsertByKey): a partitioned orders
    // table takes one upsert batch — ~1% of keys get a price bump
    // (update-in-place) and a disjoint set of NEW keys appends — with
    // only the touched status partitions rewritten (dynamic partition
    // overwrite; the untouched-partition byte-identity is spec-pinned in
    // TableUpsertSpec). The oracle recomputes the merged table from the
    // ORIGINAL parquet with the same expressions, so a pass proves the
    // anti-join + union + selective rewrite lost and invented nothing.
    "merge_upsert" -> { (spark, dir) =>
      val p = out(dir, "orders_upsert")
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) fs.delete(hp, true)
      val src = Tables
        .orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
      src.write.mode(SaveMode.Overwrite).partitionBy("o_orderstatus").parquet(p)
      val updates = src
        .filter(pmod(col("o_orderkey"), lit(97)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
        .unionByName(src
          .filter(pmod(col("o_orderkey"), lit(499)) === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
          .withColumn("o_totalprice", lit(42.5)))
      upsertByKey(spark, p, updates, Seq("o_orderkey"), "o_orderstatus")
      spark.read
        .parquet(p)
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("sum_price"),
          sum(col("o_orderkey")).as("sum_key"))
        .orderBy(col("o_orderstatus"))
    },

    // Parquet batch sink (the streaming twin is graft.streaming): write
    // partitioned parquet, re-read with a partition-pruning filter.
    // Bloom file-skipping round trip ([[buildBloomIndex]] /
    // [[bloomPointLookup]]): orders land hash-clustered by CUSTOMER (16
    // files) so the ORDER-key lookup has no layout help — exactly the
    // scattered-key case the sidecar exists for — then the minimum
    // order key is looked up THROUGH the index. The oracle recomputes
    // the row from the raw table; `pruned_ok` pins that the bloom
    // actually skipped files (candidates < total — with fpp 0.01 and 16
    // files the expected candidate count is 1, and a no-op index that
    // reads everything fails the gate).
    "bloom_point_lookup" -> { (spark, dir) =>
      val p = out(dir, "orders_bloom")
      Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          col("o_orderstatus"))
        .repartition(16, pmod(col("o_custkey"), lit(16)))
        .write
        .mode(SaveMode.Overwrite)
        .parquet(p)
      buildBloomIndex(spark, p, "o_orderkey")
      // one scalar — metadata-scale, the oracle's scalar subquery twin
      val key = Tables.orders(spark, dir).agg(min(col("o_orderkey"))).collect()(0).getLong(0)
      val (rows, cand, total) = bloomPointLookup(spark, p, "o_orderkey", key)
      rows
        .select(
          col("o_orderkey"),
          col("cents"),
          col("o_orderstatus"),
          lit(cand < total).as("pruned_ok"))
        .orderBy(col("o_orderkey"))
    },

    // Co-located BUCKETED join ([[writeBucketedTable]]): orders and
    // customer both bucketed ×16 on the customer key, then sort-merge
    // joined — the plan reads bucket i ⋈ bucket i with NO Exchange on
    // either side (spec-pinned in BucketedJoinSpec; the oracle pins the
    // VALUES by recomputing the join from the raw parquet). The
    // one-time write shuffle is the amortized cost every repeated
    // big-big join saves at 100 TB.
    "bucketed_join" -> { (spark, dir) =>
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      val ot = s"graft_bkt_orders_$tag"
      val ct = s"graft_bkt_customer_$tag"
      writeBucketedTable(
        Tables
          .orders(spark, dir)
          .select(
            col("o_orderkey"),
            col("o_custkey"),
            floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents")),
        ot, "o_custkey", 16)
      writeBucketedTable(
        Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment")),
        ct, "c_custkey", 16)
      spark
        .table(ot)
        .hint("merge")
        .join(spark.table(ct), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .orderBy(col("c_mktsegment"))
    },

    "parquet_sink_roundtrip" -> { (spark, dir) =>
      val p = out(dir, "orders_parquet")
      Tables
        .orders(spark, dir)
        .write
        .mode(SaveMode.Overwrite)
        .partitionBy("o_orderstatus")
        .parquet(p)
      spark.read
        .parquet(p)
        .filter(col("o_orderstatus") === "F")
        .groupBy(col("o_orderpriority"))
        .agg(dsum(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    },

    // Z-ORDER LAYOUT gate (r15 — upgrades [[writeZOrdered]] from
    // spec-measured to oracle-gated): orders rewritten z-ordered on
    // (o_custkey, o_orderdate) into 16 curve tiles, then a customer-range
    // × date-window box query read back THROUGH the layout. The oracle
    // recomputes the rows from the RAW table, so a green hash proves the
    // layout is a pure reorganization. `files_pruned_ok` packs the
    // file-skipping evidence into the hashed result: the per-file
    // (custkey, date) bounding boxes — computed from `_metadata`
    // exactly like a manifest/metastore would hold them — must admit
    // STRICTLY fewer candidate files than the layout holds for this box
    // (ZOrderCompactionSpec measures the full pruning matrix vs a
    // one-dimension sort; this gate keeps the claim true at every SF).
    "zorder_scan" -> { (spark, dir) =>
      val p = out(dir, "orders_zorder")
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          col("o_orderdate"),
          // TIMESTAMP(_NTZ) has no numeric cast — the curve dimension is
          // the epoch-seconds twin; the display column stays a timestamp
          col("o_orderdate").cast("timestamp").cast("long").as("odate_sec"))
      writeZOrdered(o, p, "o_custkey", "odate_sec", files = 16)
      val dLo = expr("TIMESTAMP '1996-01-01 00:00:00'")
      val dHi = expr("TIMESTAMP '1997-01-01 00:00:00'")
      // metadata-scale: one row per FILE, then one scalar
      val boxes = spark.read
        .parquet(p)
        .select(col("_metadata.file_path").as("f"), col("o_custkey"), col("o_orderdate"))
        .groupBy(col("f"))
        .agg(
          min(col("o_custkey")).as("cmin"), max(col("o_custkey")).as("cmax"),
          min(col("o_orderdate")).as("dmin"), max(col("o_orderdate")).as("dmax"))
      val hit = col("cmax") >= 10L && col("cmin") <= 40L &&
        col("dmax") >= dLo && col("dmin") < dHi
      val st = boxes.agg(sum(when(hit, 1L).otherwise(0L)), count(lit(1))).collect()(0)
      val (cand, total) = (st.getLong(0), st.getLong(1))
      spark.read
        .parquet(p)
        .filter(
          col("o_custkey").between(10L, 40L) &&
            col("o_orderdate") >= dLo && col("o_orderdate") < dHi)
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          col("cents"),
          col("o_orderdate"),
          lit(cand < total).as("files_pruned_ok"))
        .orderBy(col("o_orderkey"))
    },

    // 3-DIMENSIONAL Z-ORDER gate (r16 — [[writeZOrderedN]]): orders
    // re-clustered on (custkey, date, cents), then a 3-way box query
    // read back through the layout. The oracle recomputes from the RAW
    // table (pure reorganization), and `files_pruned_ok` packs the
    // skipping evidence for EACH dimension ALONE into the hashed result:
    // every single-dimension box must admit strictly fewer candidate
    // files than the layout holds — the third dimension is the one a
    // 2-D curve cannot serve.
    "zorder_scan3" -> { (spark, dir) =>
      val p = out(dir, "orders_zorder3")
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          col("o_orderdate"),
          col("o_orderdate").cast("timestamp").cast("long").as("odate_sec"))
      writeZOrderedN(o, p, Seq("o_custkey", "odate_sec", "cents"), files = 16)
      val dLo = expr("TIMESTAMP '1996-01-01 00:00:00'")
      val dHi = expr("TIMESTAMP '1997-01-01 00:00:00'")
      val boxes = spark.read
        .parquet(p)
        .select(
          col("_metadata.file_path").as("f"),
          col("o_custkey"), col("o_orderdate"), col("cents"))
        .groupBy(col("f"))
        .agg(
          min(col("o_custkey")).as("cmin"), max(col("o_custkey")).as("cmax"),
          min(col("o_orderdate")).as("dmin"), max(col("o_orderdate")).as("dmax"),
          min(col("cents")).as("pmin"), max(col("cents")).as("pmax"))
      def cand(hit: org.apache.spark.sql.Column): (Long, Long) = {
        val st = boxes.agg(sum(when(hit, 1L).otherwise(0L)), count(lit(1))).collect()(0)
        (st.getLong(0), st.getLong(1))
      }
      val (cA, total) = cand(col("cmax") >= 10L && col("cmin") <= 40L)
      val (cB, _) = cand(col("dmax") >= dLo && col("dmin") < dHi)
      val (cC, _) = cand(col("pmax") >= 1000000L && col("pmin") <= 4000000L)
      val prunedAll = cA < total && cB < total && cC < total
      spark.read
        .parquet(p)
        .filter(
          col("o_custkey").between(10L, 40L) &&
            col("o_orderdate") >= dLo && col("o_orderdate") < dHi &&
            col("cents").between(1000000L, 4000000L))
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          col("cents"),
          col("o_orderdate"),
          lit(prunedAll).as("files_pruned_ok"))
        .orderBy(col("o_orderkey"))
    },

    // ROW-LEVEL DELETE gate (r15 — the copy-on-write DML on a LIVE
    // manifest table, oracle-gated end-to-end): orders stream-ingests
    // through the exactly-once parquet sink in multiple micro-batches,
    // then `Optimize.deleteWhere` removes a key slice by rewriting ONLY
    // the match-bearing files under the staged-manifest swap. The
    // oracle recomputes the survivors from the raw table. Reruns in one
    // app are no-ops (the checkpoint admits no new files; the predicate
    // matches nothing after the first pass), so bench passes measure
    // the steady state.
    "table_delete_cow" -> { (spark, dir) =>
      val base = Tables.gateScratchDir(spark, dir, "cow_delete")
      val src = s"$base/src"; val tbl = s"$base/table"; val ckpt = s"$base/ckpt"
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          col("o_orderstatus"),
          col("o_orderpriority"))
      if (!new java.io.File(src).exists()) {
        o.repartition(4).write.mode(SaveMode.Overwrite).parquet(src)
      }
      val q = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", tbl)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.streaming.Optimize.deleteWhere(spark, tbl, pmod(col("o_orderkey"), lit(10L)) < 3L)
      spark.read
        .parquet(tbl)
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("cents")).as("sum_cents"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderstatus"))
    },

    // SQL spelling of the copy-on-write delete (r15): the identical
    // pipeline driven through `spark.sql("GRAFT DELETE FROM ...")` — the
    // parser-extension statement — sharing table_delete_cow's oracle BY
    // REFERENCE (the sql_span_dedup precedent): one contract, divergence
    // impossible.
    "sql_delete_cow" -> { (spark, dir) =>
      val base = Tables.gateScratchDir(spark, dir, "cow_delete_sql")
      val src = s"$base/src"; val tbl = s"$base/table"; val ckpt = s"$base/ckpt"
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          col("o_orderstatus"),
          col("o_orderpriority"))
      if (!new java.io.File(src).exists()) {
        o.repartition(4).write.mode(SaveMode.Overwrite).parquet(src)
      }
      val q = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", tbl)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.sql(s"GRAFT DELETE FROM '$tbl' WHERE pmod(o_orderkey, 10) < 3").collect(): Unit
      spark.read
        .parquet(tbl)
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("cents")).as("sum_cents"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderstatus"))
    },

    // CATALOG-NAME DML gate (r17 — the reference's query-by-NAME
    // guarantee extended to MUTATIONS): the sink directory registers as
    // an external catalog table, `GRAFT DELETE FROM <name>` resolves the
    // name to the table's location through the session catalog, and the
    // read-back is `spark.table(<name>)` — so a green hash ALSO proves
    // the catalog read serves the swapped manifest (committed survivors
    // only), not a plain listing of live + retired generations. Shares
    // table_delete_cow's oracle BY REFERENCE: one contract for the path
    // and name spellings.
    "sql_delete_by_name" -> { (spark, dir) =>
      val base = Tables.gateScratchDir(spark, dir, "cow_delete_byname")
      val src = s"$base/src"; val tbl = s"$base/table"; val ckpt = s"$base/ckpt"
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          col("o_orderstatus"),
          col("o_orderpriority"))
      if (!new java.io.File(src).exists()) {
        o.repartition(4).write.mode(SaveMode.Overwrite).parquet(src)
      }
      val q = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", tbl)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val name = s"graft_byname_orders_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      graft.streaming.StreamSinks.registerTable(spark, name, tbl, "parquet", Nil)
      spark.sql(s"GRAFT DELETE FROM $name WHERE pmod(o_orderkey, 10) < 3").collect(): Unit
      spark.table(name)
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("cents")).as("sum_cents"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderstatus"))
    },

    // ROW-LEVEL UPDATE gate (r15 — updateWhere's oracle twin on the
    // same recipe; the SET is a constant so reruns stay idempotent).
    "table_update_cow" -> { (spark, dir) =>
      val base = Tables.gateScratchDir(spark, dir, "cow_update")
      val src = s"$base/src"; val tbl = s"$base/table"; val ckpt = s"$base/ckpt"
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          col("o_orderpriority"))
      if (!new java.io.File(src).exists()) {
        o.repartition(4).write.mode(SaveMode.Overwrite).parquet(src)
      }
      val q = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", tbl)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.streaming.Optimize.updateWhere(
        spark, tbl, col("o_orderpriority") === "1-URGENT", Map("cents" -> lit(0L)))
      spark.read
        .parquet(tbl)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .orderBy(col("o_orderpriority"))
    },

    // MERGE (upsert) gate (r15 — copy-on-write MERGE INTO on a live
    // manifest table, oracle-gated end-to-end): the source carries
    // updates (every o_orderkey % 10 < 2 gets cents = 0) AND inserts
    // (offset keys), derived deterministically from the fixture so the
    // oracle recomputes the post-merge table as a CASE + UNION ALL.
    // Rerun-idempotent: a second pass re-applies identical updates and
    // its former inserts match as updates to identical values.
    "table_merge_cow" -> { (spark, dir) =>
      val base = Tables.gateScratchDir(spark, dir, "cow_merge")
      val src = s"$base/src"; val tbl = s"$base/table"; val ckpt = s"$base/ckpt"
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          col("o_orderstatus"))
      if (!new java.io.File(src).exists()) {
        o.repartition(4).write.mode(SaveMode.Overwrite).parquet(src)
      }
      val q = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", tbl)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val updates = o
        .filter(pmod(col("o_orderkey"), lit(10L)) < 2L)
        .select(col("o_orderkey"), lit(0L).as("cents"), col("o_orderstatus"))
      val inserts = o
        .filter(pmod(col("o_orderkey"), lit(100L)) === 0L)
        .select(
          (col("o_orderkey") + lit(10000000L)).as("o_orderkey"),
          lit(42L).as("cents"),
          lit("X").as("o_orderstatus"))
      graft.streaming.Optimize.mergeInto(
        spark, tbl, updates.unionByName(inserts), Seq("o_orderkey"))
      spark.read
        .parquet(tbl)
        .select(col("o_orderkey"), col("cents"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    },

    // STREAMING CDC-UPSERT gate (r15 — `Optimize.upsertSink` end-to-end,
    // oracle-gated): the SAME change set as table_merge_cow arrives as a
    // CHANGE FEED instead of one batch — base rows first, then the
    // update slice, then the inserts, each appended to the stream source
    // dir between AvailableNow drives of the upsert sink. Batch MERGE
    // and streamed CDC apply must land the IDENTICAL final state, so the
    // oracle is shared by reference. Reruns are no-ops (the checkpoint
    // has consumed every file).
    "stream_upsert_cdc" -> { (spark, dir) =>
      val base = Tables.gateScratchDir(spark, dir, "cdc_upsert")
      val src = s"$base/src"; val tbl = s"$base/table"; val ckpt = s"$base/ckpt"
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          col("o_orderstatus"))
      val sch = o.schema
      def drive(): Unit = {
        val q = graft.streaming.Optimize.upsertSink(
          spark.readStream.schema(sch).option("maxFilesPerTrigger", 2).parquet(src)
            .toDF("o_orderkey", "cents", "o_orderstatus"),
          tbl, Seq("o_orderkey"), ckpt)
        q.awaitTermination()
      }
      // stage-append a change-set into the live source dir (unique names)
      def append(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
        val tmp = s"$base/tmp_$tag"
        df.coalesce(2).write.mode(SaveMode.Overwrite).parquet(tmp)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(src), spark.sparkContext.hadoopConfiguration)
        fs.mkdirs(new org.apache.hadoop.fs.Path(src))
        fs.listStatus(new org.apache.hadoop.fs.Path(tmp)).toSeq
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
          .zipWithIndex.foreach { case (st, i) =>
            fs.rename(st.getPath,
              new org.apache.hadoop.fs.Path(src, s"feed_${tag}_$i.parquet")): Unit
          }
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true): Unit
      }
      if (!new java.io.File(src).exists()) {
        append(o, "base"); drive()
        append(
          o.filter(pmod(col("o_orderkey"), lit(10L)) < 2L)
            .select(col("o_orderkey"), lit(0L).as("cents"), col("o_orderstatus")),
          "upd")
        drive()
        append(
          o.filter(pmod(col("o_orderkey"), lit(100L)) === 0L)
            .select(
              (col("o_orderkey") + lit(10000000L)).as("o_orderkey"),
              lit(42L).as("cents"),
              lit("X").as("o_orderstatus")),
          "ins")
        drive()
      } else drive() // rerun: checkpoint already consumed the feed — no-op
      spark.read
        .parquet(tbl)
        .select(col("o_orderkey"), col("cents"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    },

    // FULL-SYNC MERGE gate (r17 — `WHEN NOT MATCHED BY SOURCE DELETE`
    // completes the MERGE triad): ONE merge applies updates (keys
    // %10 < 2 zero their cents), inserts (offset keys), AND deletes
    // every table row absent from the source (keys %10 >= 5) in a
    // single staged-manifest swap — the full-sync CDC shape ("make the
    // table equal the source"). The oracle recomputes the final state
    // as CASE + anti-filter + UNION ALL from the raw table.
    // Rerun-idempotent: after the first pass every table row is in the
    // source, so the second pass re-applies identical values and
    // deletes nothing.
    "table_merge_sync" -> { (spark, dir) =>
      val base = Tables.gateScratchDir(spark, dir, "cow_merge_sync")
      val src = s"$base/src"; val tbl = s"$base/table"; val ckpt = s"$base/ckpt"
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          col("o_orderstatus"))
      if (!new java.io.File(src).exists()) {
        o.repartition(4).write.mode(SaveMode.Overwrite).parquet(src)
      }
      val q = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", tbl)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val updatesAndKeeps = o
        .filter(pmod(col("o_orderkey"), lit(10L)) < 5L)
        .select(
          col("o_orderkey"),
          when(pmod(col("o_orderkey"), lit(10L)) < 2L, lit(0L)).otherwise(col("cents"))
            .as("cents"),
          col("o_orderstatus"))
      val inserts = o
        .filter(pmod(col("o_orderkey"), lit(100L)) === 0L)
        .select(
          (col("o_orderkey") + lit(10000000L)).as("o_orderkey"),
          lit(42L).as("cents"),
          lit("X").as("o_orderstatus"))
      graft.streaming.Optimize.mergeInto(
        spark, tbl, updatesAndKeeps.unionByName(inserts), Seq("o_orderkey"),
        deleteNotMatchedBySource = true)
      spark.read
        .parquet(tbl)
        .select(col("o_orderkey"), col("cents"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    },

    // COLUMN-LEVEL MERGE gate (r16 — `WHEN MATCHED UPDATE SET` over a
    // PARTIAL-COLUMN source, oracle-gated): the source carries only the
    // key and a cap column, the SET expression mixes both sides
    // (LEAST(t.cents, s.cap)), and WHEN NOT MATCHED is skipped — the
    // natural CDC shape for a feed that doesn't know the full row.
    // LEAST is idempotent, so bench re-passes land the same state.
    "table_merge_cols" -> { (spark, dir) =>
      val base = Tables.gateScratchDir(spark, dir, "cow_merge_cols")
      val src = s"$base/src"; val tbl = s"$base/table"; val ckpt = s"$base/ckpt"
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          col("o_orderstatus"))
      if (!new java.io.File(src).exists()) {
        o.repartition(4).write.mode(SaveMode.Overwrite).parquet(src)
      }
      val q = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", tbl)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val source = o
        .filter(pmod(col("o_orderkey"), lit(10L)) < 2L)
        .select(col("o_orderkey"), (col("o_orderkey") * 31L).as("cap"))
      graft.streaming.Optimize.mergeInto(
        spark, tbl, source, Seq("o_orderkey"),
        matchedSet = Some(Map("cents" -> expr("least(t.cents, s.cap)"))),
        insertNotMatched = false)
      spark.read
        .parquet(tbl)
        .select(col("o_orderkey"), col("cents"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    },

    // MERGE SCHEMA-EVOLUTION gate (r17 — a source shipping a NEW column
    // EVOLVES the live manifest table through the whole-row merge):
    // matched rows take the new column's source values, inserts carry
    // it, non-matched rows — in rewritten AND untouched files alike —
    // read as typed NULLs under the mergeSchema read, and untouched
    // files keep their old schema verbatim (no O(table) backfill). The
    // oracle recomputes legacy-nulls + new values from the raw table.
    // Rerun-idempotent: a replayed merge re-applies identical values
    // onto the already-evolved files.
    "table_merge_evolve" -> { (spark, dir) =>
      val base = Tables.gateScratchDir(spark, dir, "cow_merge_evolve")
      val src = s"$base/src"; val tbl = s"$base/table"; val ckpt = s"$base/ckpt"
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          col("o_orderstatus"))
      if (!new java.io.File(src).exists()) {
        o.repartition(4).write.mode(SaveMode.Overwrite).parquet(src)
      }
      val q = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", tbl)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val updates = o
        .filter(pmod(col("o_orderkey"), lit(10L)) < 2L)
        .select(
          col("o_orderkey"), lit(0L).as("cents"), col("o_orderstatus"),
          pmod(col("o_orderkey"), lit(3L)).as("tier")) // the NEW column
      val inserts = o
        .filter(pmod(col("o_orderkey"), lit(100L)) === 0L)
        .select(
          (col("o_orderkey") + lit(10000000L)).as("o_orderkey"),
          lit(42L).as("cents"),
          lit("X").as("o_orderstatus"),
          lit(7L).as("tier"))
      graft.streaming.Optimize.mergeInto(
        spark, tbl, updates.unionByName(inserts), Seq("o_orderkey"),
        evolveSchema = true)
      spark.read
        .option("mergeSchema", "true")
        .parquet(tbl)
        .select(col("o_orderkey"), col("cents"), col("o_orderstatus"), col("tier"))
        .orderBy(col("o_orderkey"))
    },

    // TABLE HISTORY + RESTORE gate (r16 — every manifest swap archives
    // the outgoing generation; RESTORE swaps an archived version back
    // in, itself archived so it is undoable): a DELETE removes a key
    // slice, then `restoreTable` to the pre-delete version — the oracle
    // recomputes the FULL table, so a green hash proves the restore
    // byte-reproduced the deleted generation. Rerun-idempotent: each
    // pass deletes and restores again (history grows, state converges).
    "table_restore" -> { (spark, dir) =>
      val base = Tables.gateScratchDir(spark, dir, "cow_restore")
      val src = s"$base/src"; val tbl = s"$base/table"; val ckpt = s"$base/ckpt"
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          col("o_orderstatus"))
      if (!new java.io.File(src).exists()) {
        o.repartition(4).write.mode(SaveMode.Overwrite).parquet(src)
      }
      val q = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", tbl)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.streaming.Optimize.deleteWhere(spark, tbl, pmod(col("o_orderkey"), lit(10L)) < 3L)
      val vPre = graft.streaming.Optimize.listVersions(spark, tbl).map(_.version).max
      graft.streaming.Optimize.restoreTable(spark, tbl, vPre)
      spark.read
        .parquet(tbl)
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("cents")).as("sum_cents"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy(col("o_orderstatus"))
    },

    // IN-PLACE SORTED RE-CLUSTERING gate (r16 — `GRAFT OPTIMIZE ... SORT
    // BY` on a LIVE manifest table): orders stream-ingest in ingest
    // order (each file spans the full key range — the scattered layout
    // the DML skew soak measures), then ONE in-place sorted rewrite
    // restores key locality under the staged-manifest swap. The oracle
    // recomputes the range query from the raw table (pure
    // reorganization), and `files_pruned_ok` hashes the evidence: after
    // the rewrite the key-range box must admit strictly fewer candidate
    // files than the table holds.
    "table_sort_cluster" -> { (spark, dir) =>
      val base = Tables.gateScratchDir(spark, dir, "sort_cluster")
      val src = s"$base/src"; val tbl = s"$base/table"; val ckpt = s"$base/ckpt"
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          col("o_orderstatus"))
      if (!new java.io.File(src).exists()) {
        o.repartition(8).write.mode(SaveMode.Overwrite).parquet(src)
      }
      val q = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", tbl)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // target ~8 output files at every SF so the pruning evidence is
      // non-vacuous (the SQL spelling is exercised in GraftSqlSpec);
      // byte sizing via ONE recursive listing, not per-file status RPCs
      val tblBytes = inputFileBytes(spark, spark.read.parquet(tbl), tbl)
      graft.streaming.Optimize.optimizeSink(
        spark, tbl, "parquet",
        targetFileBytes = math.max(4L * 1024, tblBytes / 8),
        sortDims = Seq("o_orderkey"))
      val boxes = spark.read
        .parquet(tbl)
        .select(col("_metadata.file_path").as("f"), col("o_orderkey"))
        .groupBy(col("f"))
        .agg(min(col("o_orderkey")).as("kmin"), max(col("o_orderkey")).as("kmax"))
      val st = boxes
        .agg(
          sum(when(col("kmax") >= 100L && col("kmin") <= 500L, 1L).otherwise(0L)),
          count(lit(1)))
        .collect()(0)
      val prunedOk = st.getLong(0) < st.getLong(1)
      spark.read
        .parquet(tbl)
        .filter(col("o_orderkey").between(100L, 500L))
        .select(
          col("o_orderkey"), col("cents"), col("o_orderstatus"),
          lit(prunedOk).as("files_pruned_ok"))
        .orderBy(col("o_orderkey"))
    },

    // PARTITION-SCOPED OPTIMIZE gate (r17 — `GRAFT OPTIMIZE ... WHERE
    // <partition predicate>` lifts the partitioned-table re-clustering
    // refusal): orders stream-ingest into a HIVE-PARTITIONED manifest
    // table (one dir per o_orderstatus, each partition's files spanning
    // the full key range in ingest order), then ONE scoped SORT BY
    // rewrite re-clusters ONLY partition F under the staged-manifest
    // swap. The oracle recomputes partition F's key slice from the raw
    // table (pure reorganization); two evidence flags ride the hashed
    // result: `untouched_ok` (every OTHER partition's file identities —
    // rel#mtime#len — byte-identical through the swap) and
    // `files_pruned_ok` (inside F, the key-range box admits strictly
    // fewer candidate files than F holds — the re-cluster actually
    // restored locality). Rerun-idempotent: the scoped rewrite is
    // deterministic and the untouched set is re-captured each pass.
    "table_optimize_part" -> { (spark, dir) =>
      val base = Tables.gateScratchDir(spark, dir, "opt_part")
      val src = s"$base/src"; val tbl = s"$base/table"; val ckpt = s"$base/ckpt"
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          col("o_orderstatus"))
      if (!new java.io.File(src).exists()) {
        o.repartition(4).write.mode(SaveMode.Overwrite).parquet(src)
      }
      val q = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", tbl)
        .option("checkpointLocation", ckpt)
        .partitionBy("o_orderstatus")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      def outsideIds: Set[String] = dataFileIds(spark, tbl)
        .filterNot(_.rel.startsWith("o_orderstatus=F/")).map(_.identity).toSet
      val beforeOutside = outsideIds
      // size the scoped rewrite to several output files at every SF so
      // the pruning evidence is non-vacuous; byte sizing via ONE
      // recursive listing, not per-file status RPCs
      val fBytes = inputFileBytes(
        spark, spark.read.parquet(tbl), tbl, _.contains("/o_orderstatus=F/"))
      graft.streaming.Optimize.optimizeSink(
        spark, tbl, "parquet",
        targetFileBytes = math.max(2048L, fBytes / 6),
        sortDims = Seq("o_orderkey"),
        partitionWhere = Some(col("o_orderstatus") === "F"))
      val untouchedOk = outsideIds == beforeOutside
      val boxes = spark.read
        .parquet(tbl)
        .filter(col("o_orderstatus") === "F")
        .select(col("_metadata.file_path").as("f"), col("o_orderkey"))
        .groupBy(col("f"))
        .agg(min(col("o_orderkey")).as("kmin"), max(col("o_orderkey")).as("kmax"))
      val st = boxes
        .agg(
          sum(when(col("kmax") >= 100L && col("kmin") <= 500L, 1L).otherwise(0L)),
          count(lit(1)))
        .collect()(0)
      val prunedOk = st.getLong(0) < st.getLong(1)
      spark.read
        .parquet(tbl)
        .filter(col("o_orderstatus") === "F" && col("o_orderkey").between(100L, 500L))
        .select(
          col("o_orderkey"), col("cents"),
          lit(untouchedOk).as("untouched_ok"),
          lit(prunedOk).as("files_pruned_ok"))
        .orderBy(col("o_orderkey"))
    },

    // CHANGE-FEED gate (r18 — `graft_table_changes` TVF, CDC out): a
    // DELETE archives v1 and a MERGE (updates + inserts) archives v2,
    // then the feed is read over BOTH spans — v1→v2 must be exactly the
    // deleted rows, v2→live must be delete(old)+insert(new) per updated
    // key plus the merged-in inserts, and NOTHING else: rows the COW
    // rewrites merely copied cancel in the reconciliation. The oracle
    // recomputes both row diffs from the raw orders table. Rerun-
    // idempotent: the feed addresses VERSION IDS, so the mutations run
    // only while history is still short of two versions — replays skip
    // them and re-read the same archived spans.
    "sql_table_changes" -> { (spark, dir) =>
      graft.functions.GraftExtensions.register(spark)
      val base = Tables.gateScratchDir(spark, dir, "table_changes")
      val src = s"$base/src"; val tbl = s"$base/table"; val ckpt = s"$base/ckpt"
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          col("o_orderstatus"))
      if (!new java.io.File(src).exists()) {
        o.repartition(4).write.mode(SaveMode.Overwrite).parquet(src)
      }
      val q = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", tbl)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      if (graft.streaming.Optimize.listVersions(spark, tbl).size < 2) {
        spark.sql(s"GRAFT DELETE FROM '$tbl' WHERE pmod(o_orderkey, 10) < 3").collect(): Unit
        // MERGE source: update every key ≡ 5 (mod 10) to cents+7, insert
        // the same keys shifted out of the key domain — both images are
        // deterministic functions of the fixture, so DuckDB can replay them
        val merged = o.filter(pmod(col("o_orderkey"), lit(10L)) === 5L)
        val mergeSrc = merged
          .select(col("o_orderkey"), (col("cents") + lit(7L)).as("cents"), col("o_orderstatus"))
          .unionByName(merged.select(
            (col("o_orderkey") + lit(10000000L)).as("o_orderkey"),
            col("cents"), col("o_orderstatus")))
        graft.streaming.Optimize.mergeInto(
          spark, tbl, mergeSrc, Seq("o_orderkey"),
          matchedSet = Some(Map("cents" -> col("s.cents")))): Unit
      }
      val vs = graft.streaming.Optimize.listVersions(spark, tbl).map(_.version)
      val v1 = vs.min
      val v2 = vs.max
      spark.sql(
        s"""SELECT * FROM (
           |  SELECT o_orderkey, cents, o_orderstatus, _change_type, 1 AS span
           |  FROM graft_table_changes('$tbl', $v1, $v2)
           |  UNION ALL
           |  SELECT o_orderkey, cents, o_orderstatus, _change_type, 2 AS span
           |  FROM graft_table_changes('$tbl', $v2)
           |)
           |ORDER BY span, o_orderkey, _change_type""".stripMargin)
    },

    // TYPED partition-scope RANGE gate (r18): the same scoped-rewrite
    // contract as `table_optimize_part`, but over an INT-valued
    // partition column (`hour` in {8,9,10,11}) with a RANGE scope
    // spelled as a STRING literal — `hour >= '10'`. r17 compared the
    // Hive dir-name strings lexically, so "9" >= "10" selected hour=9:
    // the wrong partition rewrote and `untouched_ok` here would hash
    // false. Typed inference (r18) casts the dir values long before
    // evaluating, so the scope is exactly {10, 11}. Evidence flags as
    // in the equality gate: `untouched_ok` pins hour<10 file identities
    // byte-identical through the swap, `files_pruned_ok` pins restored
    // key locality inside the scope.
    "table_optimize_part_range" -> { (spark, dir) =>
      val base = Tables.gateScratchDir(spark, dir, "opt_part_range")
      val src = s"$base/src"; val tbl = s"$base/table"; val ckpt = s"$base/ckpt"
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          (pmod(col("o_orderkey"), lit(4)) + lit(8)).cast("int").as("hour"))
      if (!new java.io.File(src).exists()) {
        o.repartition(4).write.mode(SaveMode.Overwrite).parquet(src)
      }
      val q = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", tbl)
        .option("checkpointLocation", ckpt)
        .partitionBy("hour")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      def outsideIds: Set[String] = dataFileIds(spark, tbl)
        .filter(f => f.rel.split('/').head.stripPrefix("hour=").toLong < 10L)
        .map(_.identity).toSet
      val beforeOutside = outsideIds
      // byte sizing via ONE recursive listing, not per-file status RPCs
      val fBytes = inputFileBytes(
        spark, spark.read.parquet(tbl), tbl,
        p => p.contains("/hour=10/") || p.contains("/hour=11/"))
      graft.streaming.Optimize.optimizeSink(
        spark, tbl, "parquet",
        targetFileBytes = math.max(2048L, fBytes / 6),
        sortDims = Seq("o_orderkey"),
        partitionWhere = Some(col("hour") >= "10"))
      val untouchedOk = outsideIds == beforeOutside
      val boxes = spark.read
        .parquet(tbl)
        .filter(col("hour") >= 10)
        .select(col("_metadata.file_path").as("f"), col("o_orderkey"))
        .groupBy(col("f"))
        .agg(min(col("o_orderkey")).as("kmin"), max(col("o_orderkey")).as("kmax"))
      val st = boxes
        .agg(
          sum(when(col("kmax") >= 100L && col("kmin") <= 500L, 1L).otherwise(0L)),
          count(lit(1)))
        .collect()(0)
      val prunedOk = st.getLong(0) < st.getLong(1)
      spark.read
        .parquet(tbl)
        .filter(col("hour") >= 10 && col("o_orderkey").between(100L, 500L))
        .select(
          col("o_orderkey"), col("cents"), col("hour").cast("int").as("hour"),
          lit(untouchedOk).as("untouched_ok"),
          lit(prunedOk).as("files_pruned_ok"))
        .orderBy(col("o_orderkey"))
    },

    // TIME-TRAVEL SQL gate (r16 — `graft_table_version` TVF): a DELETE
    // retires the pre-delete generation into history; the TVF reads
    // THAT archived version's rows while the live table keeps the
    // delete applied. The oracle recomputes the FULL table — a green
    // hash proves the archived generation is byte-faithful — and the
    // live read stays the deleted state (checked by the spec; the gate
    // hashes the time-travel read). Rerun-idempotent: the second pass's
    // delete matches nothing (no new version), so max(version) is still
    // the pre-delete manifest.
    "sql_time_travel" -> { (spark, dir) =>
      graft.functions.GraftExtensions.register(spark)
      val base = Tables.gateScratchDir(spark, dir, "time_travel")
      val src = s"$base/src"; val tbl = s"$base/table"; val ckpt = s"$base/ckpt"
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          col("o_orderstatus"))
      if (!new java.io.File(src).exists()) {
        o.repartition(4).write.mode(SaveMode.Overwrite).parquet(src)
      }
      val q = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", tbl)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.sql(s"GRAFT DELETE FROM '$tbl' WHERE pmod(o_orderkey, 10) < 3").collect(): Unit
      val vPre = spark.sql(s"GRAFT HISTORY '$tbl'").collect().map(_.getLong(0)).max
      spark.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
           |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
           |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
           |FROM graft_table_version('$tbl', $vPre)
           |GROUP BY o_orderstatus
           |ORDER BY o_orderstatus""".stripMargin)
    },

    // TIMESTAMP AS OF gate (r18): same table shape and oracle contract
    // as `sql_time_travel`, but the version is addressed by TIME — a
    // timestamp strictly after the archive instant maps to the latest
    // archived version (the pre-delete generation), so the hashed
    // result proves the mtime→version mapping picks the same manifest
    // the version-id spelling does. Rerun-idempotent: the second pass's
    // delete matches nothing (no new version), and "now" keeps mapping
    // to the same latest version.
    "sql_time_travel_ts" -> { (spark, dir) =>
      graft.functions.GraftExtensions.register(spark)
      val base = Tables.gateScratchDir(spark, dir, "time_travel_ts")
      val src = s"$base/src"; val tbl = s"$base/table"; val ckpt = s"$base/ckpt"
      val o = Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          col("o_orderstatus"))
      if (!new java.io.File(src).exists()) {
        o.repartition(4).write.mode(SaveMode.Overwrite).parquet(src)
      }
      val q = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .writeStream
        .format("parquet")
        .outputMode("append")
        .option("path", tbl)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.sql(s"GRAFT DELETE FROM '$tbl' WHERE pmod(o_orderkey, 10) < 3").collect(): Unit
      val asOf = new java.sql.Timestamp(System.currentTimeMillis() + 1000L)
      spark.sql(
        s"""SELECT o_orderstatus, COUNT(*) AS n,
           |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
           |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
           |FROM graft_table_version('$tbl', '$asOf')
           |GROUP BY o_orderstatus
           |ORDER BY o_orderstatus""".stripMargin)
    },

    // SMALL-FILE COMPACTION gate (r15 — upgrades [[compact]] from
    // spec-measured to oracle-gated): 64 micro-batch-sized files repack
    // through the shuffle-free coalesce path, and the aggregate is read
    // back from the COMPACTED copy. The oracle recomputes from the raw
    // table (compaction must preserve every row); `packed_ok` pins that
    // the rewrite actually reduced the file count at every SF.
    "compact_scan" -> { (spark, dir) =>
      val small = out(dir, "orders_smallfiles")
      val packed = out(dir, "orders_compacted")
      Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"),
          col("o_orderstatus"))
        .repartition(64)
        .write
        .mode(SaveMode.Overwrite)
        .parquet(small)
      val (nIn, nOut) = compact(spark, small, packed, targetFileBytes = 8L * 1024 * 1024)
      spark.read
        .parquet(packed)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .withColumn("packed_ok", lit(nOut < nIn))
        .orderBy(col("o_orderstatus"))
    }
  )

  /** Shared by table_merge_cow and the streaming CDC spelling
    * stream_upsert_cdc — both land the SAME final state (batch MERGE ≡
    * the same changes applied as a change feed), so one contract. */
  private lazy val mergeCowOracle: String =
    """SELECT * FROM (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 10 < 2 THEN 0
      |         ELSE CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) END AS cents,
      |    o_orderstatus
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey + 10000000 AS o_orderkey, CAST(42 AS BIGINT) AS cents,
      |    'X' AS o_orderstatus
      |  FROM orders WHERE o_orderkey % 100 = 0)
      |ORDER BY o_orderkey""".stripMargin

  /** Shared by table_restore (restore-after-delete ≡ the untouched
    * table) and sql_time_travel (the archived pre-delete generation ≡
    * the untouched table) — one contract. */
  private lazy val fullOrdersAggOracle: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
      |FROM orders
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** Shared by table_delete_cow and its GRAFT-SQL spelling
    * sql_delete_cow — one contract, divergence impossible. */
  private lazy val deleteCowOracle: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
      |FROM orders
      |WHERE NOT (o_orderkey % 10 < 3)
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  val oracles: Map[String, String] = Map(
    // The looked-up row recomputed from the raw table; pruned_ok is the
    // constant-TRUE quality-bound scheme (sim_ann_ivf precedent).
    "bloom_point_lookup" ->
      """SELECT o_orderkey,
        |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |  o_orderstatus, TRUE AS pruned_ok
        |FROM orders WHERE o_orderkey = (SELECT MIN(o_orderkey) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "bucketed_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "zorder_scan" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |  o_orderdate, TRUE AS files_pruned_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 10 AND 40
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |ORDER BY o_orderkey""".stripMargin,
    "zorder_scan3" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |  o_orderdate, TRUE AS files_pruned_ok
        |FROM orders
        |WHERE o_custkey BETWEEN 10 AND 40
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) BETWEEN 1000000 AND 4000000
        |ORDER BY o_orderkey""".stripMargin,
    "table_merge_cow" -> mergeCowOracle,
    "stream_upsert_cdc" -> mergeCowOracle,
    // the full-sync final state: updated keeps + inserts, source-absent
    // keys (o_orderkey % 10 >= 5) deleted
    "table_merge_sync" ->
      """SELECT * FROM (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 10 < 2 THEN 0
        |         ELSE CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) END AS cents,
        |    o_orderstatus
        |  FROM orders WHERE o_orderkey % 10 < 5
        |  UNION ALL
        |  SELECT o_orderkey + 10000000 AS o_orderkey, CAST(42 AS BIGINT) AS cents,
        |    'X' AS o_orderstatus
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |ORDER BY o_orderkey""".stripMargin,
    "table_merge_cols" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 10 < 2
        |       THEN LEAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT), o_orderkey * 31)
        |       ELSE CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) END AS cents,
        |  o_orderstatus
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    // legacy rows read NULL for the evolved column; matched rows carry
    // the source's values, inserts their literal
    "table_merge_evolve" ->
      """SELECT * FROM (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 10 < 2 THEN 0
        |         ELSE CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) END AS cents,
        |    o_orderstatus,
        |    CASE WHEN o_orderkey % 10 < 2 THEN o_orderkey % 3
        |         ELSE CAST(NULL AS BIGINT) END AS tier
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 10000000 AS o_orderkey, CAST(42 AS BIGINT) AS cents,
        |    'X' AS o_orderstatus, CAST(7 AS BIGINT) AS tier
        |  FROM orders WHERE o_orderkey % 100 = 0)
        |ORDER BY o_orderkey""".stripMargin,
    // restore-after-delete ≡ the untouched table; the time-travel read
    // of the pre-delete version shares the contract BY REFERENCE
    "table_restore" -> fullOrdersAggOracle,
    "sql_time_travel" -> fullOrdersAggOracle,
    "sql_time_travel_ts" -> fullOrdersAggOracle,
    "sql_table_changes" ->
      """WITH base AS (
        |  SELECT o_orderkey,
        |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |    o_orderstatus
        |  FROM orders
        |)
        |SELECT * FROM (
        |  SELECT o_orderkey, cents, o_orderstatus, 'delete' AS _change_type, 1 AS span
        |  FROM base WHERE o_orderkey % 10 < 3
        |  UNION ALL
        |  SELECT o_orderkey, cents, o_orderstatus, 'delete' AS _change_type, 2 AS span
        |  FROM base WHERE o_orderkey % 10 = 5
        |  UNION ALL
        |  SELECT o_orderkey, cents + 7, o_orderstatus, 'insert' AS _change_type, 2 AS span
        |  FROM base WHERE o_orderkey % 10 = 5
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, cents, o_orderstatus, 'insert' AS _change_type, 2 AS span
        |  FROM base WHERE o_orderkey % 10 = 5
        |)
        |ORDER BY span, o_orderkey, _change_type""".stripMargin,
    "table_delete_cow" -> deleteCowOracle,
    "sql_delete_cow" -> deleteCowOracle,
    "sql_delete_by_name" -> deleteCowOracle,
    "table_update_cow" ->
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 0
        |                ELSE CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) END) AS BIGINT) AS sum_cents
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "table_optimize_part" ->
      """SELECT o_orderkey,
        |  CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |  TRUE AS untouched_ok, TRUE AS files_pruned_ok
        |FROM orders
        |WHERE o_orderstatus = 'F' AND o_orderkey BETWEEN 100 AND 500
        |ORDER BY o_orderkey""".stripMargin,
    "table_optimize_part_range" ->
      """SELECT o_orderkey,
        |  CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |  CAST(o_orderkey % 4 + 8 AS INTEGER) AS hour,
        |  TRUE AS untouched_ok, TRUE AS files_pruned_ok
        |FROM orders
        |WHERE o_orderkey % 4 + 8 >= 10 AND o_orderkey BETWEEN 100 AND 500
        |ORDER BY o_orderkey""".stripMargin,
    "table_sort_cluster" ->
      """SELECT o_orderkey,
        |  CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |  o_orderstatus, TRUE AS files_pruned_ok
        |FROM orders
        |WHERE o_orderkey BETWEEN 100 AND 500
        |ORDER BY o_orderkey""".stripMargin,
    "compact_scan" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  TRUE AS packed_ok
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "orc_sink_roundtrip" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlSum("l_extendedprice")} AS sum_price,
         |  ${sqlSum("l_quantity")} AS sum_qty,
         |  COUNT(*) AS n
         |FROM lineitem WHERE l_returnflag <> 'N'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "orc_nested_roundtrip" ->
      s"""SELECT label, COUNT(*) AS n,
         |  (${sqlSum("embedding[1]::DOUBLE")} / COUNT(*)) AS avg_e1,
         |  (${sqlSum("embedding[2]::DOUBLE")} / COUNT(*)) AS avg_e2,
         |  CAST(SUM(vec_id) AS BIGINT) AS sum_id,
         |  CAST(MAX(len(embedding)) AS INT) AS dim,
         |  CAST(COUNT(*) AS BIGINT) AS n_map_ok
         |FROM embeddings WHERE label <= 7
         |GROUP BY label ORDER BY label""".stripMargin,
    "orc_bucketer_roundtrip" ->
      s"""SELECT event_type || '_' || (CASE WHEN value < 50 THEN 'small' ELSE 'big' END) AS bucket,
         |  ${sqlSum("value")} AS sum_value, COUNT(*) AS n
         |FROM events
         |WHERE ends_with(event_type || '_' || (CASE WHEN value < 50 THEN 'small' ELSE 'big' END), '_big')
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "csv_scan_roundtrip" ->
      s"""SELECT o_orderstatus, ${sqlSum("o_totalprice")} AS sum_price,
         |  MAX(o_orderdate) AS max_date, COUNT(*) AS n
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "json_scan_roundtrip" ->
      s"""SELECT c_mktsegment, ${sqlSum("c_acctbal")} AS sum_bal,
         |  COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n
         |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "parquet_sink_roundtrip" ->
      s"""SELECT o_orderpriority, ${sqlSum("o_totalprice")} AS sum_price, COUNT(*) AS n
         |FROM orders WHERE o_orderstatus = 'F'
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // Ground truth for the evolved table: the original parquet always
    // had the column; the even/odd split decides which rows read as
    // legacy (null) after the merge.
    "schema_evolution" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n,
         |  CAST(SUM(CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_legacy,
         |  ${sqlSum("c_acctbal")} AS sum_bal,
         |  CAST(SUM(CASE WHEN c_custkey % 2 = 1 THEN c_nationkey ELSE 0 END) AS BIGINT)
         |    AS sum_nation
         |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // Ground truth for the upsert: the merged table recomputed from the
    // original parquet with the same update/insert expressions.
    "merge_upsert" ->
      s"""WITH src AS (
         |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders),
         |m AS (
         |  SELECT o_orderkey, o_custkey,
         |    CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1000 ELSE o_totalprice END
         |      AS o_totalprice,
         |    o_orderstatus
         |  FROM src
         |  UNION ALL
         |  SELECT o_orderkey + 10000000, o_custkey, 42.5, o_orderstatus
         |  FROM src WHERE o_orderkey % 499 = 0)
         |SELECT o_orderstatus, COUNT(*) AS n,
         |  ${sqlSum("o_totalprice")} AS sum_price,
         |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
         |FROM m GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // Ground truth for the stream→promote→register→SQL-by-name chain is
    // the ORIGINAL events parquet.
    "catalog_sink_table" ->
      s"""SELECT event_type,
         |  ${sqlSum("value")} AS sum_value,
         |  COUNT(DISTINCT user_id) AS n_users,
         |  CAST(SUM(event_id) AS BIGINT) AS sum_id,
         |  COUNT(*) AS n
         |FROM events WHERE event_type <> 'view'
         |GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
