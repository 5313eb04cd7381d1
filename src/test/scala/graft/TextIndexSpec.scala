package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextIndex

/** The positional inverted index (`operators/TextIndex`): postings are
  * exact 0-based token ordinals, and the phrase leg-join counts exactly
  * the sliding-window occurrences — repeated phrases, self-overlapping
  * patterns, absent phrases, and the single-term degenerate case. */
class TextIndexSpec extends AnyFunSuite {
  private lazy val spark =
    GraftSession.builder(master = "local[2]", shufflePartitions = 2).getOrCreate()

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  private def hits(d: org.apache.spark.sql.DataFrame, phrase: String*): Map[Long, Long] =
    TextIndex
      .phraseSearch(TextIndex.buildPostings(d, "doc_id", "text"), phrase)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits"))
      .toMap

  test("postings carry exact 0-based positions") {
    val p = TextIndex.buildPostings(docs(1L -> "a b a"), "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getInt(2))).toSet
    assert(p === Set(("a", 0), ("b", 1), ("a", 2)))
  }

  test("phrase occurrences: repeats counted, absent phrases empty, cross-doc isolation") {
    val d = docs(
      1L -> "x small query line y small query line",
      2L -> "small query line",
      3L -> "query line small", // the terms, wrong order — no match
      4L -> "small line query") // wrong order again
    assert(hits(d, "small", "query", "line") === Map(1L -> 2L, 2L -> 1L))
    assert(hits(d, "never", "present") === Map.empty)
  }

  test("self-overlapping phrase counts every start position") {
    // "a a a a" contains "a a" starting at 0, 1, 2
    assert(hits(docs(7L -> "a a a a"), "a", "a") === Map(7L -> 3L))
  }

  test("single-term phrase degenerates to the term's occurrence count") {
    assert(hits(docs(1L -> "b a b b"), "b") === Map(1L -> 3L))
  }

  // ---------------- persisted (sidecar-committed) postings index ----------------

  private def freshDirs(): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft_postings").toString
    (s"$root/docs", s"$root/idx")
  }

  private def idxHits(docsPath: String, idx: String, phrase: String*): Map[Long, Long] =
    TextIndex.phraseSearchIndexed(spark, docsPath, idx, phrase)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_hits")).toMap

  test("persisted index: search ≡ in-memory postings; staleness refused loudly; " +
    "incremental refresh scans only changed files") {
    import spark.implicits._
    val (docsPath, idx) = freshDirs()
    docs(1L -> "x small query line y", 2L -> "small query line small query line")
      .coalesce(1).write.parquet(docsPath)
    val nFiles = TextIndex.buildPostingsIndex(spark, docsPath, "doc_id", "text", idx)
    assert(nFiles >= 1)
    assert(idxHits(docsPath, idx, "small", "query", "line") === Map(1L -> 1L, 2L -> 2L))
    // corpus changes after indexing → the search must refuse, not miss
    docs(3L -> "small query line").coalesce(1).write.mode("append").parquet(docsPath)
    val ex = intercept[IllegalStateException] {
      TextIndex.phraseSearchIndexed(spark, docsPath, idx, Seq("small", "query", "line"))
    }
    assert(ex.getMessage.contains("STALE"), ex.getMessage)
    // incremental refresh: exactly the one new file scanned, nothing removed
    val (added, removed) = TextIndex.updatePostingsIndex(spark, docsPath, "doc_id", "text", idx)
    assert(added === 1 && removed === 0)
    assert(idxHits(docsPath, idx, "small", "query", "line") ===
      Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    // the WRITE is a delta too: the new version dir carries ONLY the new
    // file's postings (doc 3), never a rewrite of the carried-over rows
    val delta = spark.read.parquet(s"$idx/v=2")
    assert(delta.select("doc_id").distinct().collect().map(_.getLong(0)).toSeq === Seq(3L),
      "refresh rewrote carried-over postings — the O(changed-files) write claim broke")
    // a second refresh with no corpus change is a no-op
    assert(TextIndex.updatePostingsIndex(spark, docsPath, "doc_id", "text", idx) === ((0, 0)))
    // vanished file: its rows are MASKED on the next refresh (no rewrite)
    val victimUri = spark.read.parquet(docsPath).filter($"doc_id" === 3L)
      .select(org.apache.spark.sql.functions.input_file_name()).head().getString(0)
    val victim = new java.io.File(new java.net.URI(victimUri).getPath)
    assert(victim.delete(), s"could not delete $victim")
    val (a2, r2) = TextIndex.updatePostingsIndex(spark, docsPath, "doc_id", "text", idx)
    assert(a2 === 0 && r2 === 1)
    assert(idxHits(docsPath, idx, "small", "query", "line") === Map(1L -> 1L, 2L -> 2L))
    // compaction collapses the delta chain to ONE live dir, physically
    // dropping the masked rows, with identical search results
    import graft.sources.Sidecar
    assert(Sidecar.current(spark, idx).get.liveVersions.size > 1)
    val collapsed = TextIndex.compactPostingsIndex(spark, idx)
    assert(collapsed > 1)
    val cur = Sidecar.current(spark, idx).get
    assert(cur.liveVersions.size === 1)
    assert(idxHits(docsPath, idx, "small", "query", "line") === Map(1L -> 1L, 2L -> 2L))
    assert(spark.read.parquet(cur.dataDir).filter($"doc_id" === 3L).isEmpty,
      "compaction kept the vanished file's rows")
    // compacting a single-dir index is a no-op
    assert(TextIndex.compactPostingsIndex(spark, idx) === 0)
  }

  test("persisted index: a doc file deleted and RECREATED at the same path never " +
    "serves stale rows next to the rescan") {
    val (docsPath, idx) = freshDirs()
    docs(1L -> "small query line").coalesce(1).write.parquet(docsPath)
    TextIndex.buildPostingsIndex(spark, docsPath, "doc_id", "text", idx)
    assert(idxHits(docsPath, idx, "small", "query", "line") === Map(1L -> 1L))
    val victim = new java.io.File(docsPath).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    val bytes = java.nio.file.Files.readAllBytes(victim.toPath)
    assert(victim.delete())
    assert(TextIndex.updatePostingsIndex(spark, docsPath, "doc_id", "text", idx) === ((0, 1)))
    assert(idxHits(docsPath, idx, "small", "query", "line") === Map.empty)
    // recreate the SAME path (new generation — fresh mtime); the old
    // delta's rows for the dead generation must stay masked: pre-fix the
    // path-only mask served BOTH generations and every count doubled
    java.nio.file.Files.write(victim.toPath, bytes)
    victim.setLastModified(System.currentTimeMillis() + 4000): Unit
    val (a, r) = TextIndex.updatePostingsIndex(spark, docsPath, "doc_id", "text", idx)
    assert(a === 1 && r === 0, s"expected the recreated file rescanned, got ($a,$r)")
    assert(idxHits(docsPath, idx, "small", "query", "line") === Map(1L -> 1L),
      "stale generation's rows leaked through the mask — counts doubled")
    // and a pure-deletion refresh adds NO junk version dir to the chain
    import graft.sources.Sidecar
    val liveBefore = Sidecar.current(spark, idx).get.liveVersions.size
    val victim2 = new java.io.File(docsPath).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    assert(victim2.delete())
    assert(TextIndex.updatePostingsIndex(spark, docsPath, "doc_id", "text", idx) === ((0, 1)))
    assert(Sidecar.current(spark, idx).get.liveVersions.size === liveBefore,
      "a pure-deletion refresh grew the live chain")
  }

  test("persisted index: crash mid-refresh leaves the OLD index serving (staged dir inert)") {
    import spark.implicits._
    val (docsPath, idx) = freshDirs()
    docs(1L -> "small query line").coalesce(1).write.parquet(docsPath)
    TextIndex.buildPostingsIndex(spark, docsPath, "doc_id", "text", idx)
    // plant staged debris as if a refresh crashed before its pointer flip
    Seq(("junk", 99L, 0, "nonexistent")).toDF("term", "doc_id", "pos", "src_file")
      .write.parquet(s"$idx/v=2")
    assert(idxHits(docsPath, idx, "small", "query", "line") === Map(1L -> 1L),
      "staged (uncommitted) index version leaked into a search")
    // recovery: a rebuild commits past the debris
    TextIndex.buildPostingsIndex(spark, docsPath, "doc_id", "text", idx)
    assert(idxHits(docsPath, idx, "small", "query", "line") === Map(1L -> 1L))
  }

  test("bm25: term-bearing docs only, sane ordering, k-truncation, staleness, delta refresh") {
    val (docsPath, idx) = freshDirs()
    docs(
      1L -> "apple banana banana",          // both query terms, short
      2L -> "banana cherry cherry cherry",  // one query term, longer
      3L -> "apple apple apple apple",      // one term, high tf
      4L -> "durian durian"                 // no query terms
    ).coalesce(1).write.parquet(docsPath)
    TextIndex.buildPostingsIndex(spark, docsPath, "doc_id", "text", idx)

    def run(k: Int): Seq[(Long, Long, Double)] =
      TextIndex.bm25Search(spark, docsPath, idx, Seq("apple", "banana"), k)
        .orderBy("rnk").collect()
        .map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq

    val all = run(10)
    assert(all.map(_._2).toSet === Set(1L, 2L, 3L), "only term-bearing docs may score")
    assert(all.map(_._1) === Seq(1L, 2L, 3L), "ranks must be dense from 1")
    assert(all.map(_._3) === all.map(_._3).sorted.reverse, "scores must be rank-ordered")
    // doc 1 carries BOTH terms with tf 1+2 in the shortest doc — it must
    // outrank doc 2 (single term, tf 1, longer doc)
    val byDoc = all.map(t => t._2 -> t._1).toMap
    assert(byDoc(1L) < byDoc(2L), s"both-term short doc did not outrank: $all")
    // k truncates
    assert(run(2).map(_._1) === Seq(1L, 2L))

    // staleness refusal, then the DELTA refresh carries doclen rows so
    // the appended doc both scores and shifts N/avgdl consistently
    docs(5L -> "apple").coalesce(1).write.mode("append").parquet(docsPath)
    val ex = intercept[IllegalStateException] {
      TextIndex.bm25Search(spark, docsPath, idx, Seq("apple"), 5)
    }
    assert(ex.getMessage.contains("STALE"))
    TextIndex.updatePostingsIndex(spark, docsPath, "doc_id", "text", idx): Unit
    val after = run(10)
    assert(after.map(_._2).contains(5L), "refreshed index lost the appended doc in BM25")
    // the one-term one-token doc has the best length normalization for
    // 'apple' — sanity that its score is positive and finite
    assert(after.forall(t => t._3 > 0.0 && !t._3.isNaN))
  }

  test("bm25SearchPruned ≡ bm25Search on every query shape; the prune branch actually fires") {
    val (docsPath, idx) = freshDirs()
    // 100 docs: 'stop' in every doc (df=100 ⇒ common at the 5% cut),
    // 'rare' in 4 (df=4 < cut=5 ⇒ selective), filler terms per doc
    val rows = (1L to 100L).map { i =>
      val rare = if (i <= 4) " rare" else ""
      (i, s"stop filler$i word${i % 7}$rare")
    }
    docs(rows: _*).coalesce(2).write.parquet(docsPath)
    TextIndex.buildPostingsIndex(spark, docsPath, "doc_id", "text", idx)

    def both(q: Seq[String], k: Int): (Seq[(Long, Long, Double)], Seq[(Long, Long, Double)]) = {
      def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("rnk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      (rows(TextIndex.bm25Search(spark, docsPath, idx, q, k)),
        rows(TextIndex.bm25SearchPruned(spark, docsPath, idx, q, k)))
    }

    // mixed selective + common with enough candidates: the prune branch
    // fires (the stop word's upper bound is idf-tiny vs the rare term's
    // candidate scores) and the results are identical
    val (fullMixed, prunedMixed) = both(Seq("rare", "stop"), 3)
    assert(TextIndex.lastPruneFired, "prune branch did not fire on the designed mixed query")
    assert(TextIndex.lastStatsFromSidecar,
      "a fresh r18 build must serve bound statistics from the _termstats sidecar")
    assert(prunedMixed == fullMixed, s"pruned diverged: $prunedMixed vs $fullMixed")
    assert(prunedMixed.map(_._2).forall(id => id <= 4),
      "top-k under a rare+stop query must be rare-bearing docs")

    // common-only: no selective terms — full-scoring fallback, identical
    val (fullC, prunedC) = both(Seq("stop"), 5)
    assert(!TextIndex.lastPruneFired)
    assert(prunedC == fullC)

    // selective-only: nothing to prune — identical
    val (fullS, prunedS) = both(Seq("rare"), 5)
    assert(!TextIndex.lastPruneFired)
    assert(prunedS == fullS)

    // fewer candidates than k: bound cannot clear — fallback, identical
    val (fullF, prunedF) = both(Seq("rare", "stop"), 50)
    assert(!TextIndex.lastPruneFired, "prune fired with fewer candidates than k")
    assert(prunedF == fullF)
  }

  test("pruned BM25 stats survive delta refresh + deletion mask; a pre-r18 index falls back") {
    val (docsPath, idx) = freshDirs()
    val rows = (1L to 200L).map { i =>
      // rare df=2 stays under the 5% cut at EVERY corpus size this test
      // passes through (150 docs → cut 7; 200 → 10; 150 after the
      // delta-file deletion → 7), so 'rare' is always selective and
      // 'stop' (every doc) always common
      (i, s"stop filler$i word${i % 5}${if (i <= 2) " rare" else ""}")
    }
    docs(rows.take(150): _*).coalesce(2).write.parquet(docsPath)
    TextIndex.buildPostingsIndex(spark, docsPath, "doc_id", "text", idx)
    // DELTA refresh: the appended files' stats rows ride the delta
    // version dir — merged (sum df / max tf / min dl) with the base's
    // at read time, so the pruned path stays exact and sidecar-served
    docs(rows.drop(150): _*).coalesce(1).write.mode("append").parquet(docsPath)
    TextIndex.updatePostingsIndex(spark, docsPath, "doc_id", "text", idx)
    def bothRows(q: Seq[String], k: Int) = {
      def r(df: org.apache.spark.sql.DataFrame) = df.orderBy("rnk").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSeq
      (r(TextIndex.bm25Search(spark, docsPath, idx, q, k)),
        r(TextIndex.bm25SearchPruned(spark, docsPath, idx, q, k)))
    }
    val (fullD, prunedD) = bothRows(Seq("rare", "stop"), 2)
    assert(prunedD == fullD)
    assert(TextIndex.lastPruneFired && TextIndex.lastStatsFromSidecar,
      "delta-refreshed index must still prune from sidecar stats")
    // PURE-DELETION refresh: a vanished doc file narrows the fingerprint
    // without rewriting — its stats rows must leave the merge with it
    // (the same src_file mask as the postings). Delete the DELTA file
    // (the one holding doc 180) so the rare docs survive and the
    // post-deletion classification stays mixed.
    val victimUri = spark.read.parquet(docsPath)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 180L)
      .select(org.apache.spark.sql.functions.input_file_name()).head().getString(0)
    assert(new java.io.File(new java.net.URI(victimUri).getPath).delete())
    TextIndex.updatePostingsIndex(spark, docsPath, "doc_id", "text", idx)
    val (fullDel, prunedDel) = bothRows(Seq("rare", "stop"), 2)
    assert(prunedDel == fullDel, "masked stats diverged after a doc-file deletion")
    assert(TextIndex.lastPruneFired && TextIndex.lastStatsFromSidecar)
    // PRE-r18 index: strip the _termstats sidecars — serving falls back
    // to query-time statistics, identical results, flag reports it
    def rmStats(d: java.io.File): Unit = d.listFiles.foreach { f =>
      if (f.getName == "_termstats") { rmTree(f) }
      else if (f.isDirectory) rmStats(f)
    }
    def rmTree(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rmTree)
      assert(f.delete())
    }
    rmStats(new java.io.File(idx))
    val (fullL, prunedL) = bothRows(Seq("rare", "stop"), 2)
    assert(prunedL == fullL, "legacy fallback diverged")
    assert(TextIndex.lastPruneFired && !TextIndex.lastStatsFromSidecar,
      "a stats-less index must fall back to query-time statistics (and still prune)")
  }

  test("bm25 refuses PARTIAL doclen coverage and pre-dl indexes loudly; delta rows carry dl") {
    val (docsPath, idx) = freshDirs()
    docs(1L -> "apple banana", 2L -> "apple apple apple").coalesce(1).write.parquet(docsPath)
    TextIndex.buildPostingsIndex(spark, docsPath, "doc_id", "text", idx)
    docs(3L -> "banana").coalesce(1).write.mode("append").parquet(docsPath)
    TextIndex.updatePostingsIndex(spark, docsPath, "doc_id", "text", idx): Unit

    // DELTA versions carry the denormalized doc length like the full
    // build: every token row holds its doc's token count
    val cur = graft.sources.Sidecar.current(spark, idx).get
    assert(cur.liveVersions.size == 2, "expected base + delta version dirs")
    val live = spark.read.parquet(cur.liveDirs(idx): _*)
    assert(live.columns.contains("dl"))
    assert(live.filter("term IS NOT NULL AND (dl IS NULL OR dl <= 0)").count() == 0,
      "a token row lost its doc length")
    assert(live.filter("doc_id = 3 AND term IS NOT NULL").collect()
      .forall(_.getAs[Int]("dl") == 1), "delta rows carry the wrong doc length")
    assert(TextIndex.bm25Search(spark, docsPath, idx, Seq("apple"), 5).count() == 2)

    // rewrite one committed version dir in place (test-only surgery)
    def rewriteDir(dir: String)(
        f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val tmp = dir + "_surgery"
      f(spark.read.parquet(dir)).write.mode("overwrite").parquet(tmp)
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(fs.delete(new org.apache.hadoop.fs.Path(dir), true))
      assert(fs.rename(new org.apache.hadoop.fs.Path(tmp), new org.apache.hadoop.fs.Path(dir)))
    }

    // SIMULATE the pre-r16-then-delta-refreshed hazard: strip the BASE
    // version's doclen rows — the fingerprint still matches the corpus
    // and doclen rows EXIST (the delta's), so a non-empty check would
    // pass while N/avgdl undercount and every base doc silently drops
    // from scoring. The per-file coverage guard refuses instead.
    rewriteDir(cur.liveDirs(idx).last)(_.filter("term IS NOT NULL"))
    val exCov = intercept[IllegalArgumentException] {
      TextIndex.bm25Search(spark, docsPath, idx, Seq("apple"), 5)
    }
    assert(exCov.getMessage.contains("doc-length rows for only"), exCov.getMessage)
    // phrase search is unaffected — it never reads doc lengths
    assert(TextIndex.phraseSearchIndexed(spark, docsPath, idx, Seq("apple")).count() == 2)

    // NULL dl VALUES on doc-length rows (r18): a pre-dl base whose
    // doclen rows schema-merge a NULL dl from a newer delta passes the
    // per-file coverage check (the rows EXIST) and then NPE'd at
    // Row.getDouble on the null per-file sum — must be the same loud
    // rebuild refusal instead (surgery on the DELTA's doclen rows: the
    // NULL-dl guard fires before the coverage one)
    rewriteDir(cur.liveDirs(idx).head)(df =>
      df.withColumn("dl",
        org.apache.spark.sql.functions.when(df("term").isNull,
          org.apache.spark.sql.functions.lit(null)).otherwise(df("dl"))))
    val exNull = intercept[IllegalArgumentException] {
      TextIndex.bm25Search(spark, docsPath, idx, Seq("apple"), 5)
    }
    assert(exNull.getMessage.contains("NULL dl"), exNull.getMessage)

    // an index PREDATING the per-row dl column entirely: loud schema
    // refusal, never nulls into the normalization
    cur.liveDirs(idx).foreach(d => rewriteDir(d)(_.drop("dl")))
    val exDl = intercept[IllegalArgumentException] {
      TextIndex.bm25Search(spark, docsPath, idx, Seq("apple"), 5)
    }
    assert(exDl.getMessage.contains("predates the per-row doc-length column"), exDl.getMessage)
  }

  test("persisted index build plan is UDF-free and tags exactly the listed generations") {
    val (docsPath, _) = freshDirs()
    docs(1L -> "small query line", 2L -> "a b").write.parquet(docsPath)
    val files = graft.sources.FileIO.dataFileIds(spark, docsPath)
    val p = TextIndex.snapshotPostings(spark, docsPath, files, "doc_id", "text")
    // per-file identity work must never ride the per-row path: the plan
    // is builtin expressions + one broadcast join (r15 — pre-fix a
    // ScalaUDF decoded every posting row's file path)
    val udfs = p.queryExecution.optimizedPlan.flatMap(_.expressions.flatMap(_.collect {
      case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
    }))
    assert(udfs.isEmpty, s"postings build plan contains UDFs: $udfs")
    val tagged = p.select("src_file").distinct().collect().map(_.getString(0)).toSet
    assert(tagged === files.map(_.identity).toSet,
      "scan-sourced tags diverged from the listing's generation identities")
  }

  test("persisted index: searching before any build is refused loudly") {
    val (docsPath, idx) = freshDirs()
    docs(1L -> "a").coalesce(1).write.parquet(docsPath)
    val ex = intercept[IllegalArgumentException] {
      TextIndex.phraseSearchIndexed(spark, docsPath, idx, Seq("a"))
    }
    assert(ex.getMessage.contains("buildPostingsIndex"), ex.getMessage)
  }
}
