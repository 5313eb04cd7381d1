package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** INVERTED-INDEX text search (SURVEY §2.2 "Text analysis" extension,
  * r13) — the IR-engine primitive the reference's users run downstream
  * of the sink (Hive/Presto LIKE scans): a positional posting list
  * (term, doc_id, pos) makes term and PHRASE queries term-selective
  * joins instead of full-corpus regex scans.
  *
  * Scale posture: the postings build is one codegen'd posexplode over
  * the token array — no shuffle, no window; write it `bucketBy(term)`
  * (the FileIO.writeBucketedTable layout) and every term filter becomes
  * a bucket-pruned scan. A phrase query touches ONLY its terms' posting
  * rows: each term's leg filters the postings (predicate pushdown to the
  * scan), normalizes its position to the phrase START (pos − i), and the
  * legs equi-join on (doc_id, start) — occurrence count = join
  * cardinality, no string rematch. Stop-term caveat: a phrase containing
  * a stop-word-grade term carries that term's full posting list into one
  * leg — the classic IR fix (bigram/positional stop-word indexes) composes
  * on the same layout; AQE skew-split handles the interim.
  *
  * Determinism: positions are 0-based token ordinals from a
  * single-space split — pure integers, so the DuckDB oracle reproduces
  * counts exactly.
  */
object TextIndex {
  type Q = (SparkSession, String) => DataFrame

  /** Positional posting list: one row per token occurrence.
    * @return (term, doc_id, pos) */
  def buildPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
      .select(col("term"), col("doc_id"), col("pos"))

  // ------------------------------------------------------------------
  // PERSISTED postings index — the disk-backed twin of [[buildPostings]]
  // under the Sidecar commit protocol (the r13 bloom-index recipe): the
  // postings land in a versioned sidecar dir whose single `_CURRENT`
  // pointer carries BOTH the live version and a fingerprint of the doc
  // table's data files. Queries refuse loudly when the corpus changed
  // after indexing (never a silently incomplete result), and refreshes
  // scan ONLY new files — O(changed files), not O(corpus).
  // ------------------------------------------------------------------

  /** Posting rows of the given doc FILES, each row tagged with its
    * source file's GENERATION identity (rel#mtime#len — FileIO's
    * DataFileId): the read-time mask joins on the generation, so a file
    * deleted and later RECREATED at the same path can never serve its
    * stale rows next to the rescanned ones (a path-only tag would pass
    * both generations through the fingerprint mask — silent duplicate
    * counts).
    *
    * UDF-free tagging (r15): path→identity resolution is per-FILE work,
    * so it never rides the per-row path. A metadata-only pre-pass
    * collects each scanned file's `_metadata.file_path` (one row per
    * file — the column is constant within a file, so the partial
    * aggregate collapses before any shuffle and no data column is
    * read); the driver decodes those URI-encoded names ONCE each and
    * FAILS LOUDLY on any name that doesn't resolve to a listed file
    * (the scan reads exactly the listed files, so a miss is always a
    * path-decoding bug — tagging it with a never-matching identity
    * would silently drop its rows at the fingerprint mask instead).
    * The per-row plan is then a broadcast join on the raw (encoded)
    * scan name — builtin expressions only, whole-stage codegen intact
    * (TextIndexSpec pins the plan UDF-free). */
  private[graft] def snapshotPostings(
      spark: SparkSession,
      docsPath: String,
      files: Seq[graft.sources.FileIO.DataFileId],
      idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    import graft.sources.FileIO
    import spark.implicits._
    val rootAbs = FileIO.tableRootAbs(spark, docsPath)
    val byRel = files.map(f => f.rel -> f.identity).toMap
    val docs = spark.read
      .option("basePath", FileIO.basePathOf(spark, docsPath))
      .parquet(files.map(_.full).sorted: _*)
    val scanNames = docs
      .select(col("_metadata.file_path").as("f"))
      .distinct()
      .as[String]
      .collect()
    val mapping = scanNames.toSeq.sorted.map { f =>
      val rel = FileIO.relPathFromScan(f, rootAbs)
      val id = byRel.getOrElse(rel, throw new IllegalStateException(
        s"postings build: scanned file '$f' decodes to '$rel', which is not in the listed " +
          s"snapshot of $docsPath — path-decoding bug (scan-space and listing-space " +
          "identities diverged); refusing to write postings that the fingerprint mask " +
          "would silently drop"))
      (f, id)
    }
    val mapped = broadcast(mapping.toDF("__sf", "src_file"))
    // `dl` (the doc's token count) rides DENORMALIZED on every posting
    // row (r17): BM25's per-(doc,term) normalization then reads it off
    // the already-term-pruned tf leg — the r16 shape re-joined the tf
    // leg against a corpus-wide doclen exchange at every query. One int
    // per row is the classic IR denormalization trade (RLE/dictionary
    // encodes it to near-nothing in parquet), bought once at build time.
    // The token array materializes ONCE in its own projection: spelling
    // size(split(..)) next to posexplode(split(..)) re-tokenized every
    // document twice (CollapseProject refuses to inline a non-cheap
    // alias used twice, so the explicit projection is what pins the
    // single evaluation — measured 2x on the build without it).
    val withToks = docs
      .select(
        col("_metadata.file_path").as("__sf"),
        col(idCol).as("doc_id"),
        split(col(textCol), " ").as("__toks"))
    val tokens = withToks
      .select(
        col("__sf"), col("doc_id"), size(col("__toks")).as("dl"),
        posexplode(col("__toks")).as(Seq("pos", "term")))
      .join(mapped, Seq("__sf"))
      .select(col("term"), col("doc_id"), col("pos"), col("dl"), col("src_file"))
    // DOC-LENGTH rows (r16, the BM25 corpus statistics): one NULL-term
    // row per doc with pos = dl = its token count. Rides the SAME
    // versioned layout (masked/compacted/deleted with its file's
    // generation like any posting); term filters never match NULL so
    // phrase legs are unaffected, and the N/avgdl read is parquet-stats-
    // pruned to the null-bearing files (IsNull pushes down on
    // null_count). This is what keeps BM25 from re-scanning the corpus
    // for |D| at query time — and ZERO-length docs live ONLY here (they
    // have no token rows), so N/avgdl must come from these rows, never
    // from distinct-ing the token side.
    val doclens = withToks
      .select(col("__sf"), col("doc_id"), size(col("__toks")).as("pos"))
      .join(mapped, Seq("__sf"))
      .select(
        lit(null).cast("string").as("term"), col("doc_id"), col("pos"),
        col("pos").as("dl"), col("src_file"))
    tokens.unionByName(doclens)
  }

  private def scanAndWrite(
      spark: SparkSession,
      docsPath: String,
      files: Seq[graft.sources.FileIO.DataFileId],
      idCol: String,
      textCol: String,
      stage: String): Unit =
    writePostingsVersion(snapshotPostings(spark, docsPath, files, idCol, textCol), stage)

  /** Writes one version of the postings (term-range-clustered: each
    * output file covers a tight term range, so a term filter prunes
    * whole files via parquet min/max stats — the writeSorted recipe
    * applied to the posting list; `bucketBy(term)` is the catalog-table
    * upgrade on the same layout), plus the version's per-term BOUND
    * statistics under [[TermStatsDir]]. */
  private def writePostingsVersion(
      postings: org.apache.spark.sql.DataFrame, stage: String): Unit = {
    postings
      .repartitionByRange(col("term"))
      .sortWithinPartitions(col("term"), col("doc_id"), col("pos"))
      .write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(stage)
    writeTermStats(postings.sparkSession, stage)
  }

  /** Underscore-prefixed INSIDE each version dir, so postings scans
    * never see it (the `_spark_metadata` listing convention). */
  private[graft] val TermStatsDir = "_termstats"

  /** Per-(term, src_file) BM25 BOUND statistics, written at every
    * build/refresh/compact from the version's just-written posting rows
    * (r18 — the max-score stats the verdict calls "computable at
    * build/compact time"): df, max tf, and min doc length of the docs
    * CONTAINING the term. Per-FILE keying is what makes maintenance
    * O(changed files): a file's stats are immutable alongside its
    * postings, deltas add rows for new files only, the read side masks
    * by the same fingerprint semi-join as the postings, and the merge
    * across files is sum/max/min — exact under the one-doc-one-file
    * assumption the N/avgdl doclen rows already make. Serving BM25
    * pruning from these rows means a stop-word-ish query term's df/idf
    * and score upper bound cost a stats-row read, never an O(df)
    * posting-row aggregation. */
  private def writeTermStats(spark: SparkSession, stage: String): Unit =
    spark.read.parquet(stage)
      .filter(col("term").isNotNull)
      .groupBy(col("term"), col("src_file"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
      .groupBy(col("term"), col("src_file"))
      .agg(
        count(lit(1)).as("df"),
        max(col("tf")).as("max_tf"),
        min(col("dl")).cast("int").as("min_dl"))
      .repartitionByRange(col("term"))
      .sortWithinPartitions(col("term"))
      .write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$stage/$TermStatsDir")

  /** Default sidecar root for a table's postings index: underscore-
    * prefixed INSIDE the table dir (hidden from scans — the
    * `_spark_metadata` convention), one per (idCol, textCol). */
  def defaultIndexDir(docsPath: String, idCol: String, textCol: String): String =
    s"$docsPath/_postings_${idCol}_$textCol"

  /** Build-or-refresh in one call — the idempotent spelling streaming
    * maintenance hooks need (StreamSinks.maintainedParquetSink): first
    * batch bootstraps the index, every later batch pays O(changed
    * files); an unchanged listing returns (0, 0) untouched.
    * @return (filesAdded, filesRemoved) — a full build reports
    *         (snapshotSize, 0) */
  def refreshPostingsIndex(
      spark: SparkSession,
      docsPath: String,
      idCol: String,
      textCol: String,
      indexDir: String): (Int, Int) =
    if (graft.sources.Sidecar.current(spark, indexDir).isEmpty)
      (buildPostingsIndex(spark, docsPath, idCol, textCol, indexDir), 0)
    else updatePostingsIndex(spark, docsPath, idCol, textCol, indexDir)

  /** Full postings build over the doc table at `docsPath`, committed to
    * the sidecar at `indexDir`. One listing is the snapshot for BOTH the
    * scan and the fingerprint (the bloom-index discipline: a concurrently
    * appended doc file can never be fingerprinted without postings — it
    * surfaces as a loud staleness refusal instead).
    * @return number of doc files indexed */
  def buildPostingsIndex(
      spark: SparkSession,
      docsPath: String,
      idCol: String,
      textCol: String,
      indexDir: String): Int = {
    import graft.sources.{FileIO, Sidecar}
    val snapshot = FileIO.dataFileIds(spark, docsPath)
    // IDEMPOTENT build (r18): the postings are a pure, deterministic
    // function of the doc files the sidecar fingerprint pins, so when a
    // committed index already matches the CURRENT listing — same
    // generation identities, not just paths — re-scanning and re-writing
    // it would produce byte-equivalent rows for pure I/O cost (measured:
    // ~1.2 s per call at sf0.1, paid by every serving query that calls
    // build-then-search). Skip instead, exactly like updatePostingsIndex
    // returns (0, 0) on a no-change refresh. Guard: every live dir must
    // carry the TermStatsDir sidecar (the current-format marker) — an
    // index written by a pre-stats builder rebuilds rather than serving
    // the old layout forever.
    // The skip additionally requires the root colspec marker to match
    // (r19, ADVICE): the sidecar fingerprint pins the doc FILES but not
    // the indexed COLUMNS, so a caller rebuilding an explicit indexDir
    // from different columns must get a rebuild (the pre-r18 'build
    // always rewrites' repair semantics), not silently-mismatched
    // postings. Pre-colspec indexes rebuild once and gain the marker.
    // Plain boolean instead of a return-from-closure
    // (NonLocalReturnControl is fragile under catch-Throwable).
    val skippable = Sidecar.current(spark, indexDir).exists { cur =>
      cur.fingerprint == snapshot.map(_.identity).toSet &&
        colspecMatches(spark, indexDir, idCol, textCol) && {
          val hconf = spark.sparkContext.hadoopConfiguration
          cur.liveDirs(indexDir).forall { d =>
            val p = new org.apache.hadoop.fs.Path(s"$d/$TermStatsDir")
            p.getFileSystem(hconf).exists(p)
          }
        }
    }
    if (skippable) return snapshot.size
    val (v, stage) = Sidecar.nextStage(spark, indexDir)
    if (snapshot.nonEmpty) scanAndWrite(spark, docsPath, snapshot, idCol, textCol, stage)
    else {
      emptyPostings(spark).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(stage)
      // empty stats too: an empty base must not disable the sidecar-
      // stats path for every delta that follows it
      writeTermStats(spark, stage)
    }
    Sidecar.commit(spark, indexDir, v, snapshot.map(_.identity).toSet)
    writeColspec(spark, indexDir, idCol, textCol)
    snapshot.size
  }

  /** Root-level marker recording which (idCol, textCol) an index was
    * built from — the idempotent-build skip's column guard (r19,
    * ADVICE). Written AFTER the pointer commit: a crash between the two
    * leaves the marker stale/absent, which only disables the skip (the
    * next build rewrites — the safe direction). Lives at the root, not
    * in version dirs, so the delta/refresh layout and the fingerprint
    * diff logic are untouched. */
  private val ColspecFile = "_colspec"

  private def colspecPath(indexDir: String) =
    new org.apache.hadoop.fs.Path(s"$indexDir/$ColspecFile")

  private def writeColspec(
      spark: SparkSession, indexDir: String, idCol: String, textCol: String): Unit = {
    val p = colspecPath(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/.$ColspecFile.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$idCol\t$textCol".getBytes("UTF-8"))
    finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"could not commit colspec marker at $p")
  }

  private def colspecMatches(
      spark: SparkSession, indexDir: String, idCol: String, textCol: String): Boolean = {
    val p = colspecPath(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && {
      val in = fs.open(p)
      try {
        val bytes = new Array[Byte](256)
        val n = in.read(bytes)
        n > 0 && new String(bytes, 0, n, "UTF-8") == s"$idCol\t$textCol"
      } finally in.close()
    }
  }

  private def emptyPostings(spark: SparkSession) =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("term", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("pos", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("dl", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("src_file", org.apache.spark.sql.types.StringType))))

  /** INCREMENTAL postings refresh — O(changed files) in SCAN *and*
    * WRITE: only the APPEARED doc files are scanned, exploded, and
    * written (as a DELTA version dir — the earlier live dirs carry over
    * untouched on disk); VANISHED files' rows are masked at read time by
    * the fingerprint semi-join ([[phraseSearchIndexed]]) and physically
    * reclaimed by [[compactPostingsIndex]]. The new delta + the new
    * fingerprint + the widened live set become visible in one atomic
    * pointer flip (a crash mid-refresh leaves the OLD index serving,
    * consistently gated). A full-rewrite refresh would be O(index) per
    * ingest batch — the delta layout is what keeps continuous
    * maintenance affordable at corpus scale.
    * @return (filesAdded, filesRemoved) */
  def updatePostingsIndex(
      spark: SparkSession,
      docsPath: String,
      idCol: String,
      textCol: String,
      indexDir: String): (Int, Int) = {
    import graft.sources.{FileIO, Sidecar}
    val cur = Sidecar.current(spark, indexDir).getOrElse(throw new IllegalArgumentException(
      s"no committed postings index at $indexDir — build one with buildPostingsIndex first"))
    val ids = FileIO.dataFileIds(spark, docsPath)
    // GENERATION identities: a doc file rewritten or recreated at the
    // same path is gone+fresh — its old rows leave the mask and the new
    // bytes are rescanned (a path-only compare would serve BOTH
    // generations: silently doubled phrase counts)
    val gone = cur.fingerprint -- ids.map(_.identity)
    val fresh = ids.filterNot(id => cur.fingerprint.contains(id.identity)).sortBy(_.rel)
    if (gone.isEmpty && fresh.isEmpty) return (0, 0)
    val newFp = ids.map(_.identity).toSet
    if (fresh.isEmpty) {
      // pure deletion: nothing to scan, nothing to write — re-commit the
      // SAME live set with the narrowed fingerprint (the read-side
      // mask); no junk delta dir enters the chain
      Sidecar.commit(spark, indexDir, cur.version, newFp,
        extraLive = cur.liveVersions.filterNot(_ == cur.version))
    } else {
      val (v, stage) = Sidecar.nextStage(spark, indexDir)
      scanAndWrite(spark, docsPath, fresh, idCol, textCol, stage)
      Sidecar.commit(spark, indexDir, v, newFp, extraLive = cur.liveVersions)
    }
    (fresh.size, gone.size)
  }

  /** Collapse the delta chain: rewrite the LIVE, fingerprint-masked
    * postings into one fresh version (term-re-clustered — deltas
    * cluster only within themselves) and commit it as the single live
    * dir; superseded deltas are GC'd behind the grace window. Run it on
    * the maintenance cadence, like any LSM compaction.
    * @return number of live version dirs collapsed */
  def compactPostingsIndex(spark: SparkSession, indexDir: String): Int = {
    import graft.sources.Sidecar
    val cur = Sidecar.current(spark, indexDir).getOrElse(throw new IllegalArgumentException(
      s"no committed postings index at $indexDir — build one with buildPostingsIndex first"))
    if (cur.liveVersions.size <= 1) return 0
    val (v, stage) = Sidecar.nextStage(spark, indexDir)
    writePostingsVersion(maskedPostings(spark, indexDir, cur), stage)
    Sidecar.commit(spark, indexDir, v, cur.fingerprint)
    cur.liveVersions.size
  }

  /** The live postings: union of the live delta dirs, masked to rows
    * whose source doc file GENERATION is still in the fingerprint
    * (vanished or superseded generations' rows stay on disk until
    * compaction but can never serve). The mask is a broadcast semi-join
    * on the metadata-scale fingerprint — one row per DOC FILE, the same
    * class as the bloom sidecar itself — and applies UNCONDITIONALLY:
    * even a single live dir can carry masked rows (a pure-deletion
    * refresh narrows the fingerprint without rewriting anything). */
  private def maskedPostings(
      spark: SparkSession, indexDir: String, cur: graft.sources.Sidecar.Current) = {
    import spark.implicits._
    val live = spark.read.parquet(cur.liveDirs(indexDir): _*)
    val fp = cur.fingerprint.toSeq.toDF("src_file")
    live.join(broadcast(fp), Seq("src_file"), "left_semi")
  }

  /** Phrase search through the PERSISTED postings: same semantics as
    * [[phraseSearch]], but the legs read the committed index (term-
    * clustered files → per-term pruning) instead of re-exploding the
    * corpus. Refuses loudly when the doc table changed after indexing —
    * a stale index would silently miss occurrences in new files. */
  /** Staleness gate shared by every index-serving query: the index's
    * fingerprint must equal the doc table's CURRENT listing, else the
    * result would silently miss (or double) occurrences. */
  private def requireFreshIndex(
      spark: SparkSession, docsPath: String, indexDir: String): graft.sources.Sidecar.Current = {
    import graft.sources.{FileIO, Sidecar}
    val cur = Sidecar.current(spark, indexDir).getOrElse(throw new IllegalArgumentException(
      s"no committed postings index at $indexDir — build one with buildPostingsIndex first"))
    val listing = FileIO.dataFileIdentitySet(spark, docsPath)
    if (listing != cur.fingerprint) {
      val gone = cur.fingerprint -- listing
      val fresh = listing -- cur.fingerprint
      throw new IllegalStateException(
        s"postings index at $indexDir is STALE: the doc table changed after indexing " +
          s"(${gone.size} indexed file(s) vanished, ${fresh.size} unindexed file(s) appeared) — " +
          "searching it would silently miss occurrences; refresh with updatePostingsIndex")
    }
    cur
  }

  def phraseSearchIndexed(
      spark: SparkSession,
      docsPath: String,
      indexDir: String,
      phrase: Seq[String]): DataFrame = {
    val cur = requireFreshIndex(spark, docsPath, indexDir)
    phraseSearch(maskedPostings(spark, indexDir, cur).select("term", "doc_id", "pos"), phrase)
  }

  /** BM25 RANKED retrieval through the persisted postings (Robertson/
    * Spärck Jones; the Lucene-variant IDF ln((N − df + 0.5)/(df + 0.5)
    * + 1)): top-k docs for a bag-of-terms query, scored
    *
    *   Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|D|/avgdl))
    *
    * entirely from the index — the tf legs read ONLY the query terms'
    * posting rows (term-range-clustered files → stats-pruned scan,
    * plan-pinned), |D| rides DENORMALIZED on each posting row (`dl`,
    * r17 — so the normalization joins NOTHING corpus-wide; the r16
    * shape re-joined the tf leg against every doc's length at every
    * query), and N/avgdl are one metadata-scale aggregate over the
    * NULL-term doc-length rows the build embeds (pruned via null_count
    * stats; their per-file counts also gate PARTIAL doclen coverage
    * loudly — a pre-r16 index delta-refreshed since would otherwise
    * silently drop every pre-refresh doc from scoring). No corpus scan,
    * no regex — the ranked upgrade over boolean [[phraseSearch]], and
    * the lexical leg [[graft.operators.Similarity]]'s rrfFuse composes
    * with (it consumes any (doc_id, rnk) leg).
    *
    * ENGINE-PORTABLE determinism (the Exact discipline): idf quantizes
    * to the 1e-6 lattice straight after the one transcendental (ln),
    * each (doc, term) contribution quantizes to an INTEGER count of
    * 1e-6 units, and the final score is an integer sum — so Spark and
    * DuckDB (different libm) can only disagree if ln lands within an
    * ulp of a lattice edge, and ordering ties break on doc_id over
    * exact integers. All remaining arithmetic is IEEE
    * mul/div/add on identical literals — bit-deterministic by
    * definition. Returns (rnk, doc_id, score).
    */
  def bm25Search(
      spark: SparkSession,
      docsPath: String,
      indexDir: String,
      query: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val (_, live, nDocs, avgdl) = bm25Prep(spark, docsPath, indexDir, query, k)
    bm25ScoreAll(live, nDocs, avgdl, query.distinct, k, k1, b)
  }

  /** Freshness + coverage guards and the corpus statistics — shared by
    * the full and the max-score-pruned BM25 paths. Returns the committed
    * sidecar state, the masked live postings, N, and avgdl. */
  private def bm25Prep(
      spark: SparkSession,
      docsPath: String,
      indexDir: String,
      query: Seq[String],
      k: Int): (graft.sources.Sidecar.Current, DataFrame, Long, Double) = {
    require(query.nonEmpty, "bm25Search needs at least one term")
    require(k > 0, s"bm25Search: k=$k")
    val cur = requireFreshIndex(spark, docsPath, indexDir)
    val live = maskedPostings(spark, indexDir, cur)
    // an index whose rows predate the denormalized doc length cannot
    // score — refuse loudly, never serve nulls into the normalization
    require(live.columns.contains("dl"),
      s"bm25Search: index at $indexDir predates the per-row doc-length column — rebuild " +
        "with buildPostingsIndex (or compact after a refresh) to embed BM25 statistics")
    // N/avgdl come from the NULL-term doc-length rows (one per doc —
    // zero-length docs exist ONLY here), counted per source file so
    // PARTIAL coverage is a loud refusal: an index built before the
    // doclen rows existed and then delta-refreshed passes a mere
    // non-empty check while undercounting N/avgdl AND silently dropping
    // every pre-refresh doc from scoring — wrong rankings, no error.
    // One metadata-scale aggregate (one row per indexed FILE).
    val dlByFile = live
      .filter(col("term").isNull)
      .groupBy(col("src_file"))
      .agg(count(lit(1)).as("n"), sum(col("dl").cast("double")).as("total"),
        count(when(col("dl").isNull, lit(1))).as("null_dl"))
      .collect()
    // a doc-length ROW whose dl VALUE is null is the schema-merge twin
    // of missing coverage: a still-fresh pre-r16 base with an r17+ delta
    // infers the dl column from the delta file, passes the per-file
    // coverage check below, then NPEs (or mis-scores) on the legacy
    // rows' nulls — refuse with the same rebuild guidance instead (r18)
    val nullDl = dlByFile.map(_.getLong(3)).sum
    require(nullDl == 0L,
      s"bm25Search: index at $indexDir has $nullDl doc-length row(s) with NULL dl — " +
        "rows predate the per-row doc-length column (schema-merged from a newer delta). " +
        "Rebuild with buildPostingsIndex or compact after a refresh")
    val covered = dlByFile.map(_.getString(0)).toSet
    val uncovered = cur.fingerprint -- covered
    require(uncovered.isEmpty,
      s"bm25Search: index at $indexDir has doc-length rows for only ${covered.size} of " +
        s"${cur.fingerprint.size} indexed file(s) — built before r16 and delta-refreshed " +
        s"since (first uncovered: ${uncovered.headOption.getOrElse("")}); scoring would " +
        "silently drop every pre-refresh doc. Rebuild with buildPostingsIndex or compact")
    val nDocs = dlByFile.map(_.getLong(1)).sum
    require(nDocs > 0L,
      s"bm25Search: index at $indexDir holds no documents — nothing to rank")
    // doc lengths are integer-valued doubles: their sum and this division
    // are exact/deterministic across engines
    val avgdl = dlByFile.map(_.getDouble(2)).sum / nDocs
    (cur, live, nDocs, avgdl)
  }

  /** Per-(term, doc) tf leg: term-pruned scan; the per-doc length rides
    * each posting row, so the normalization needs NO join against an
    * un-term-filtered postings leg (the r16 corpus-wide exchange). */
  private def bm25TfLeg(live: DataFrame, terms: Seq[String]): DataFrame = live
    .filter(col("term").isin(terms: _*))
    .groupBy(col("term"), col("doc_id"))
    .agg(count(lit(1)).as("tf"), max(col("dl")).cast("double").as("dl"))

  /** idf quantized at 1e-6 immediately after ln — the cross-engine
    * determinism lattice. */
  private def bm25IdfQ(nDocs: Long): org.apache.spark.sql.Column = floor(
    log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
      lit(1000000.0) + lit(0.5)) / lit(1000000.0)

  /** The un-idf'd tf-normalization term of BM25 — monotone in tf,
    * shared by scoring (per row) and the max-score bound (per-term
    * max). */
  private def bm25Tfn(k1: Double, b: Double, avgdl: Double): org.apache.spark.sql.Column =
    col("tf") * lit(k1 + 1) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))

  /** Integer-quantized per-(term, doc) contribution; score = exact
    * integer sum (order-free). */
  private def bm25Contrib(k1: Double, b: Double, avgdl: Double): org.apache.spark.sql.Column =
    floor(col("idf_q") * bm25Tfn(k1, b, avgdl) * lit(1000000.0) + lit(0.5)).cast("long")

  /** top-k WITHOUT a global window (the fleet-wide scale rule): sort +
    * limit plans TakeOrderedAndProject (per-partition heaps, never a
    * single-task funnel), then rank assignment is a k×k broadcast
    * nested-loop count over the k survivors — bounded by k, not data. */
  private def bm25RankTopK(scored: DataFrame, k: Int): DataFrame = {
    val top = scored.orderBy(col("s").desc, col("doc_id").asc).limit(k)
    val before = top.select(col("doc_id").as("b_id"), col("s").as("b_s"))
    top
      .join(
        broadcast(before),
        col("b_s") > col("s") || (col("b_s") === col("s") && col("b_id") < col("doc_id")),
        "left")
      .groupBy(col("doc_id"), col("s"))
      .agg((count(col("b_id")) + lit(1)).cast("long").as("rnk"))
      .select(col("rnk"), col("doc_id"), (col("s") / lit(1000000.0)).as("score"))
  }

  private def bm25ScoreAll(
      live: DataFrame, nDocs: Long, avgdl: Double,
      terms: Seq[String], k: Int, k1: Double, b: Double): DataFrame = {
    val tf = bm25TfLeg(live, terms)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df.withColumn("idf_q", bm25IdfQ(nDocs))
        .select(col("term"), col("idf_q"))), Seq("term"))
      .withColumn("c", bm25Contrib(k1, b, avgdl))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("s"))
    bm25RankTopK(scored, k)
  }

  /** The fingerprint-masked LIVE per-term bound statistics, merged
    * across files and generations (df = sum, max_tf = max, min_dl =
    * min — all exact: a doc file's stats live in exactly one live
    * generation, like its postings). None when ANY live dir predates
    * the [[TermStatsDir]] sidecar (pre-r18 index) — callers fall back
    * to query-time statistics; pruning is an optimization, never a
    * requirement. */
  private def liveTermStats(
      spark: SparkSession,
      indexDir: String,
      cur: graft.sources.Sidecar.Current,
      terms: Seq[String]): Option[Map[String, (Long, Long, Int)]] = {
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    val dirs = cur.liveDirs(indexDir).map(d => s"$d/$TermStatsDir")
    val allPresent = dirs.forall { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(hconf).exists(p)
    }
    if (!allPresent) None
    else {
      val fp = cur.fingerprint.toSeq.toDF("src_file")
      Some(spark.read.parquet(dirs: _*)
        .filter(col("term").isin(terms: _*))
        .join(broadcast(fp), Seq("src_file"), "left_semi")
        .groupBy(col("term"))
        .agg(sum(col("df")).as("df"), max(col("max_tf")).as("max_tf"),
          min(col("min_dl")).as("min_dl"))
        .collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getInt(3))))
        .toMap)
    }
  }

  /** MAX-SCORE pruned BM25 (r18 — the WAND family adapted to a batch
    * columnar engine): identical results to [[bm25Search]], but when
    * the query mixes SELECTIVE terms with COMMON (stop-word-ish) ones,
    * the common terms' df/idf and score UPPER BOUNDS come from the
    * build-time [[TermStatsDir]] sidecar (never an O(df) posting
    * aggregation), the per-doc scoring runs over only the docs that
    * contain at least one selective term, and when the common bounds'
    * sum is strictly below the k-th candidate score, no common-only doc
    * can enter the top-k — the whole common-only population skips the
    * (term, doc) aggregation, the score shuffle, and the sort. Exact,
    * never approximate: if the bound does NOT clear the threshold (or
    * every term is common, or fewer than k candidates exist), the path
    * falls back to full scoring, and a pre-r18 index without the stats
    * sidecar falls back to computing the same statistics at query time.
    *
    * What is and is not saved, honestly: the candidates' exact scores
    * still need their common-term tf rows, so the common terms'
    * posting FILES are still scanned once (filtered by the candidate
    * semi-join before any aggregation — a columnar scan has no
    * doc-ordered skip pointers); the savings are the common-side stats
    * aggregation (now a build-time artifact) and the corpus-wide
    * (term, doc) + per-doc score shuffles (now candidate-only).
    * tools/Bm25PruneProbe measures both paths; SCALING.md records the
    * table either way. */
  def bm25SearchPruned(
      spark: SparkSession,
      docsPath: String,
      indexDir: String,
      query: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      commonDfFrac: Double = 0.05): DataFrame = {
    val (cur, live, nDocs, avgdl) = bm25Prep(spark, docsPath, indexDir, query, k)
    val terms = query.distinct
    lastPruneFired = false
    lastStatsFromSidecar = false

    liveTermStats(spark, indexDir, cur, terms) match {
      case Some(stats) =>
        lastStatsFromSidecar = true
        // driver-side twins of bm25IdfQ/bm25Tfn over the sidecar stats —
        // IDENTICAL literal structure (same IEEE ops in the same order),
        // so the idf fed into scoring is the value the expression would
        // compute, on the same 1e-6 lattice
        def idfQ(df: Long): Double =
          math.floor(math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0) * 1000000.0 + 0.5) /
            1000000.0
        def tfnD(tf: Double, dl: Double): Double =
          tf * (k1 + 1) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
        // +1: one 1e-6 score unit of slack so the bound stays valid even
        // if a row's contrib lands an ulp above the driver's extreme-
        // point evaluation — pruning fires a hair less often, never wrong
        def ub(t: String): Long = stats.get(t).map { case (df, maxTf, minDl) =>
          math.floor(idfQ(df) * tfnD(maxTf.toDouble, minDl.toDouble) * 1000000.0 + 0.5)
            .toLong + 1L
        }.getOrElse(0L)
        val idfFrame = {
          val s2 = spark
          import s2.implicits._
          broadcast(terms.flatMap(t => stats.get(t).map(s => (t, idfQ(s._1))))
            .toDF("term", "idf_q"))
        }
        def scoreOf(frame: DataFrame): DataFrame = frame
          .join(idfFrame, Seq("term"))
          .withColumn("c", bm25Contrib(k1, b, avgdl))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("s"))
        val commonCut = math.max(1L, (nDocs * commonDfFrac).toLong)
        val selective = terms.filter(t => stats.get(t).exists(_._1 < commonCut))
        val common = terms.filterNot(selective.contains)
        if (selective.isEmpty || common.isEmpty) {
          bm25RankTopK(scoreOf(bm25TfLeg(live, terms)), k)
        } else {
          // candidates: docs holding >= 1 selective term, scored FULLY —
          // the semi-join filters the common terms' rows BELOW the
          // (term, doc) aggregation, so no corpus-wide agg ever runs
          val candDocs = live.filter(col("term").isin(selective: _*))
            .select(col("doc_id")).distinct()
          val candTf = live.filter(col("term").isin(terms: _*))
            .join(candDocs, Seq("doc_id"), "left_semi")
            .groupBy(col("term"), col("doc_id"))
            .agg(count(lit(1)).as("tf"), max(col("dl")).cast("double").as("dl"))
          val candScored = scoreOf(candTf).localCheckpoint()
          val topCand = candScored.orderBy(col("s").desc, col("doc_id").asc).limit(k)
            .collect()
          val theta = if (topCand.length < k) Long.MinValue else topCand.last.getLong(1)
          if (topCand.length >= k && common.map(ub).sum < theta) {
            // no common-only doc can reach theta: the candidate top-k IS
            // the global top-k — the common-only population never
            // aggregates, shuffles, or sorts
            lastPruneFired = true
            bm25RankTopK(candScored, k)
          } else {
            bm25RankTopK(scoreOf(bm25TfLeg(live, terms)), k)
          }
        }

      case None =>
        bm25PrunedQueryTimeStats(spark, live, nDocs, avgdl, terms, k, k1, b, commonDfFrac)
    }
  }

  /** The pre-r18-index fallback of [[bm25SearchPruned]]: same split /
    * bound / threshold protocol, statistics computed at query time from
    * one materialized term-pruned tf leg (the shape the sidecar stats
    * replace — kept so legacy indexes still serve, just without the
    * common-side scan savings). */
  private def bm25PrunedQueryTimeStats(
      spark: SparkSession, live: DataFrame, nDocs: Long, avgdl: Double,
      terms: Seq[String], k: Int, k1: Double, b: Double, commonDfFrac: Double): DataFrame = {
    // one materialization of the term-pruned tf leg — reused by stats,
    // candidate scoring, and any fallback without re-scanning the index
    val tf = bm25TfLeg(live, terms).localCheckpoint()
    val stats = tf
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), max(bm25Tfn(k1, b, avgdl)).as("maxtfn"))
      .withColumn("idf_q", bm25IdfQ(nDocs))
      .withColumn("ub",
        floor(col("idf_q") * col("maxtfn") * lit(1000000.0) + lit(0.5)).cast("long"))
      .select(col("term"), col("df"), col("idf_q"), col("ub"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
    val idfFrame = {
      val s2 = spark
      import s2.implicits._
      broadcast(stats.toSeq.map { case (t, (_, idf, _)) => (t, idf) }.toDF("term", "idf_q"))
    }
    def scoreOf(frame: DataFrame): DataFrame = frame
      .join(idfFrame, Seq("term"))
      .withColumn("c", bm25Contrib(k1, b, avgdl))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("s"))
    val commonCut = math.max(1L, (nDocs * commonDfFrac).toLong)
    val selective = terms.filter(t => stats.get(t).exists(_._1 < commonCut))
    val common = terms.filterNot(selective.contains)
    val ubCommonSum = common.map(t => stats.get(t).map(_._3).getOrElse(0L)).sum
    if (selective.isEmpty || common.isEmpty) {
      bm25RankTopK(scoreOf(tf), k)
    } else {
      // candidates: docs holding >= 1 selective term, scored FULLY
      // (their common-term rows ride in via the doc-id semi-join)
      val candDocs = tf.filter(col("term").isin(selective: _*))
        .select(col("doc_id")).distinct()
      val candScored = scoreOf(tf.join(candDocs, Seq("doc_id"), "left_semi"))
      val topCand = candScored.orderBy(col("s").desc, col("doc_id").asc).limit(k)
        .collect()
      val theta = if (topCand.length < k) Long.MinValue else topCand.last.getLong(1)
      if (topCand.length >= k && ubCommonSum < theta) {
        // no common-only doc can reach theta: the candidate top-k IS the
        // global top-k — the common-only population never shuffles
        lastPruneFired = true
        bm25RankTopK(candScored, k)
      } else {
        bm25RankTopK(scoreOf(tf), k)
      }
    }
  }

  /** Observability hooks for [[bm25SearchPruned]]: whether the LAST call
    * on this JVM actually took the pruned branch (vs falling back to
    * full scoring), and whether its statistics came from the build-time
    * sidecar (vs the query-time legacy fallback). Spec/probe-side only —
    * results are identical either way. */
  @volatile private[graft] var lastPruneFired: Boolean = false
  @volatile private[graft] var lastStatsFromSidecar: Boolean = false

  /** Exact consecutive-phrase occurrence counts through the postings:
    * (doc_id, n_hits) for every doc containing the phrase at least
    * once. n_hits counts distinct START positions (occurrences cannot
    * double-count — one row per start). */
  def phraseSearch(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch needs at least one term")
    val legs = phrase.zipWithIndex.map { case (t, i) =>
      postings
        .filter(col("term") === t)
        .select(col("doc_id"), (col("pos") - lit(i)).as("start"))
    }
    legs
      .reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The fixture phrase: present with ≥3 occurrences at every fixture
    * scale (measured via DuckDB over sf0.001/0.01/0.1), so the gate is
    * non-vacuous everywhere the driver runs it. */
  private[graft] val FixturePhrase = Seq("small", "query", "line")

  /** The prune-fixture query: 'dup' sits at exactly 5% df at EVERY
    * fixture scale (25/500, 25/500, 250/5000 — measured via DuckDB)
    * while every other vocabulary term is ~77% dense, so with
    * commonDfFrac just above 0.05 the query mixes one SELECTIVE term
    * with two COMMON ones and the max-score prune branch fires at all
    * three SFs (25 ≥ k=20 candidates, common upper bounds idf-tiny vs
    * the dup-bearing candidate scores). */
  private[graft] val PrunedFixtureQuery = Seq("dup", "query", "line")

  val queries: Map[String, Q] = Map(
    // Phrase search through the positional inverted index: build
    // postings over the document corpus, count exact occurrences of a
    // three-term phrase per doc. The oracle recomputes occurrences
    // set-theoretically (positional trigrams) in DuckDB — a green hash
    // proves the leg-join IS the sliding-window definition.
    "text_phrase_search" -> { (spark, dir) =>
      val postings = buildPostings(Tables.documents(spark, dir), "doc_id", "text")
      phraseSearch(postings, FixturePhrase)
        .orderBy(col("doc_id"))
    },

    // The PERSISTED spelling: build the sidecar-committed postings index
    // on disk, search the phrase through it — same oracle BY REFERENCE
    // as text_phrase_search, so a green hash proves the staleness-gated
    // disk round trip loses nothing vs the in-memory postings.
    "text_phrase_search_idx" -> { (spark, dir) =>
      val docsPath = s"$dir/documents.parquet"
      // applicationId-scoped scratch (Tables.gateScratchDir): Sidecar is
      // single-maintainer, and a concurrent test suite + bench on one
      // machine would otherwise race pointer flips in one shared dir
      val idx = Tables.gateScratchDir(spark, dir, "postings_idx")
      buildPostingsIndex(spark, docsPath, "doc_id", "text", idx)
      phraseSearchIndexed(spark, docsPath, idx, FixturePhrase)
        .orderBy(col("doc_id"))
    },

    // The SQL spelling of the PERSISTED index: build/refresh stay
    // maintenance-side (like any database index), the SEARCH is one
    // graft_phrase_search_idx call over (docsPath, indexDir) — same
    // staleness refusal, same term-pruned legs, same oracle BY
    // REFERENCE as text_phrase_search_idx.
    "sql_phrase_search_idx" -> { (spark, dir) =>
      graft.functions.GraftExtensions.register(spark)
      val docsPath = s"$dir/documents.parquet"
      val idx = Tables.gateScratchDir(spark, dir, "postings_idx_sql")
      buildPostingsIndex(spark, docsPath, "doc_id", "text", idx)
      spark.sql(
        s"""SELECT doc_id, n_hits
           |FROM graft_phrase_search_idx('$docsPath', '$idx',
           |                             '${FixturePhrase.mkString(" ")}')
           |ORDER BY doc_id""".stripMargin)
    },

    // BM25 RANKED retrieval gate (r16): top-20 docs for the fixture
    // terms, scored entirely from the persisted index (tf legs pruned to
    // the query terms, |D| from the embedded doclen rows, N/avgdl one
    // metadata aggregate). The oracle recomputes the full Robertson
    // formula in DuckDB with the identical literal text and the Exact
    // quantization chain — a green hash pins scores AND ranking across
    // engines.
    "text_bm25" -> { (spark, dir) =>
      val docsPath = s"$dir/documents.parquet"
      val idx = Tables.gateScratchDir(spark, dir, "postings_bm25")
      buildPostingsIndex(spark, docsPath, "doc_id", "text", idx)
      bm25Search(spark, docsPath, idx, FixturePhrase, 20)
        .orderBy(col("rnk"))
    },

    // MAX-SCORE pruned BM25 (r18): the SAME ranked-retrieval contract
    // scored through bm25SearchPruned on a mixed selective+common query
    // (PrunedFixtureQuery — the prune branch actually fires at every
    // fixture SF, pinned in TextIndexSpec/PlanAuditSpec). The oracle
    // recomputes the FULL un-pruned formula in DuckDB, so a green hash
    // proves pruning is an optimization, never an approximation.
    "text_bm25_pruned" -> { (spark, dir) =>
      val docsPath = s"$dir/documents.parquet"
      val idx = Tables.gateScratchDir(spark, dir, "postings_bm25_pruned")
      buildPostingsIndex(spark, docsPath, "doc_id", "text", idx)
      bm25SearchPruned(spark, docsPath, idx, PrunedFixtureQuery, 20,
        commonDfFrac = 0.06)
        .orderBy(col("rnk"))
    },

    // The SQL spelling: one graft_bm25 TABLE FUNCTION call — same oracle
    // BY REFERENCE, so a SQL-only user gets ranked retrieval too.
    "sql_bm25" -> { (spark, dir) =>
      graft.functions.GraftExtensions.register(spark)
      val docsPath = s"$dir/documents.parquet"
      val idx = Tables.gateScratchDir(spark, dir, "postings_bm25_sql")
      buildPostingsIndex(spark, docsPath, "doc_id", "text", idx)
      spark.sql(
        s"""SELECT rnk, doc_id, score
           |FROM graft_bm25('$docsPath', '$idx', '${FixturePhrase.mkString(" ")}', 20)
           |ORDER BY rnk""".stripMargin)
    },

    // The SQL spelling: the same leg-join plan reached through the
    // graft_phrase_search TABLE FUNCTION — same oracle BY REFERENCE, so
    // a SQL-only user gets index-shaped phrase counting from one call.
    "sql_phrase_search" -> { (spark, dir) =>
      graft.functions.GraftExtensions.register(spark)
      Tables.documents(spark, dir).createOrReplaceTempView("graft_phrase_docs")
      spark.sql(
        s"""SELECT doc_id, n_hits
           |FROM graft_phrase_search('graft_phrase_docs', 'doc_id', 'text',
           |                         '${FixturePhrase.mkString(" ")}')
           |ORDER BY doc_id""".stripMargin)
    }
  )

  private val phraseOracle: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |g AS (
       |  SELECT doc_id, array_to_string(list_slice(ts, u.p + 1, u.p + 3), ' ') AS tri
       |  FROM t, LATERAL (SELECT unnest(range(0, len(ts) - 2)) AS p) u
       |  WHERE len(ts) >= 3)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits FROM g
       |WHERE tri = '${FixturePhrase.mkString(" ")}'
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** The full BM25 recomputation in DuckDB — literal-for-literal the
    * Spark expression ([[bm25Search]]'s determinism note): same k1/b
    * literals, same association order, same 1e-6 quantization chain,
    * same integer score sum, same (s DESC, doc_id ASC) top-k with the
    * rank defined as 1 + |rows sorting strictly before|. Exposed as a
    * CTE chain ending in `bm_rank(rnk, doc_id, s)` so compositions
    * (the RRF fusion gate) reuse ONE formula text — two copies could
    * drift. */
  private[graft] def bm25RankedCte(k: Int, terms: Seq[String] = FixturePhrase): String =
    s"""bm_t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |bm_dl AS (SELECT doc_id, CAST(len(ts) AS DOUBLE) AS dl FROM bm_t),
       |bm_st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(dl) AS total FROM bm_dl),
       |bm_tf AS (
       |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(ts) AS term FROM bm_t) q
       |  WHERE term IN (${terms.map(t => s"'$t'").mkString(", ")})
       |  GROUP BY doc_id, term),
       |bm_dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM bm_tf GROUP BY term),
       |bm_idf AS (
       |  SELECT term,
       |    FLOOR(ln((bm_st.n - df + 0.5) / (df + 0.5) + 1.0) * 1000000.0 + 0.5) / 1000000.0 AS idf_q
       |  FROM bm_dft CROSS JOIN bm_st),
       |bm_sc AS (
       |  SELECT bm_tf.doc_id,
       |    CAST(SUM(CAST(FLOOR(
       |      bm_idf.idf_q * (bm_tf.tf * (1.2 + 1) /
       |        (bm_tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * bm_dl.dl / (bm_st.total / bm_st.n))))
       |      * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s
       |  FROM bm_tf
       |  JOIN bm_idf ON bm_idf.term = bm_tf.term
       |  JOIN bm_dl ON bm_dl.doc_id = bm_tf.doc_id
       |  CROSS JOIN bm_st
       |  GROUP BY bm_tf.doc_id),
       |bm_top AS (SELECT doc_id, s FROM bm_sc ORDER BY s DESC, doc_id ASC LIMIT $k),
       |bm_rank AS (
       |  SELECT
       |    CAST((SELECT COUNT(*) FROM bm_top b
       |          WHERE b.s > a.s OR (b.s = a.s AND b.doc_id < a.doc_id)) + 1 AS BIGINT) AS rnk,
       |    a.doc_id, a.s
       |  FROM bm_top a)""".stripMargin

  private val bm25Oracle: String =
    s"""WITH ${bm25RankedCte(20)}
       |SELECT rnk, doc_id, s / 1000000.0 AS score
       |FROM bm_rank
       |ORDER BY rnk""".stripMargin

  val oracles: Map[String, String] = Map(
    "text_phrase_search" -> phraseOracle,
    // persisted-index and TVF spellings share the contract by reference
    "text_phrase_search_idx" -> phraseOracle,
    "sql_phrase_search_idx" -> phraseOracle,
    "sql_phrase_search" -> phraseOracle,
    "text_bm25" -> bm25Oracle,
    "sql_bm25" -> bm25Oracle,
    // the UN-pruned formula over the pruned gate's term set: a green
    // hash proves max-score pruning returns the exact global top-k
    "text_bm25_pruned" ->
      s"""WITH ${bm25RankedCte(20, PrunedFixtureQuery)}
         |SELECT rnk, doc_id, s / 1000000.0 AS score
         |FROM bm_rank
         |ORDER BY rnk""".stripMargin
  )
}
