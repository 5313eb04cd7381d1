package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic BPE tokenizer — train AND apply (SURVEY §2.2 "Text
  * analysis" extension, r14): the missing "real token ids" stage between
  * the corpus and the sequence-layout operators (select_token_budget /
  * pack_chunks previously counted whitespace tokens).
  *
  * Training is the classic greedy pair-merge recurrence (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword Units" —
  * public algorithm), made ENGINE-PORTABLE deterministic:
  *   - the unit of training is the distinct-WORD table (word, freq) —
  *     words are the [a-z]+ runs of the lowercased text; the corpus-sized
  *     aggregation happens ONCE, every merge round works on the vocab,
  *     which is orders of magnitude smaller than the corpus at any scale;
  *   - a word is cell-encoded as '|'-prefixed symbols ("line" →
  *     "|l|i|n|e"): the '|' appears ONLY at symbol starts, so a literal
  *     `replace(word, "|a|b", "|ab")` is exactly the greedy left-to-right
  *     non-overlapping BPE merge — alignment is guaranteed by the prefix
  *     and the fixed scan order of `replace` in BOTH Spark and DuckDB
  *     (spec-pinned on the '|a|a|a' overlap case);
  *   - pair ranking is (summed freq DESC, pattern string ASC) — an
  *     integer count plus a binary string compare, so the two engines
  *     can never disagree on a tie.
  *
  * Application is a codegen-friendly chain: per word, the N learned
  * merges fold into N chained `replace` calls inside one `transform`
  * lambda — all builtin string expressions, whole-stage codegen keeps
  * the hot path fused (no UDF).
  *
  * Scale posture (r15/r16): [[trainMergesFast]] is THE trainer —
  * ONE distributed corpus aggregation, then the merge recurrence runs
  * driver-side over the distinct-word table with incremental pair-count
  * maintenance (per-round cost = the chosen pair's word set, no
  * per-round Spark job; SCALING.md carries the ≥1k-merge rehearsal).
  * Its one-Spark-job-per-round reference twin lives in TEST scope
  * (BpeReferenceTrainer), where the spec equates both. Trained models
  * PERSIST ([[saveBpeModel]]/[[loadBpeModel]]/[[trainOrLoadMerges]] —
  * the PQ-model lifecycle applied to the tokenizer). Apply = pure
  * per-row map at the scan, no shuffle — the codegen'd replace chain up
  * to [[ReplaceChainMaxMerges]], the cursor-equivalent
  * [[tokenizeFast]] mapPartitions twin past it. The oracle
  * recomputes the SAME recurrence in DuckDB as one recursive CTE (the
  * evt_ewma discipline): train over the working vocab table with the
  * argmax as a scalar subquery per iteration, then apply the ranked
  * merges to every doc word — a green hash proves the distributed loop
  * IS the sequential definition.
  */
object Bpe {
  type Q = (SparkSession, String) => DataFrame

  /** Merge rounds for the gated queries (enough to learn multi-char
    * subwords on the fixture vocab; bounded oracle cost). */
  private[graft] val NMerges = 30

  /** Budget for select_token_budget_bpe (the whitespace twin uses 10000;
    * BPE token counts run higher so the budget scales with them). */
  private val BpeBudget = 20000L

  private def wordsExpr(textCol: String) =
    expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")

  /** The replacement a merge pattern stands for: "|a|b" → "|ab". */
  private[graft] def repOf(bp: String): String = "|" + bp.substring(1).replace("|", "")

  /** Distinct-word training table: (word cell-encoded, freq). */
  private[graft] def vocabOf(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(wordsExpr(textCol)).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("f"))
      .select(regexp_replace(col("w"), "(.)", "|$1").as("word"), col("f"))

  /** Adjacent-pair patterns of one cell-encoded word (all positions —
    * overlaps COUNT in ranking, per the classic recurrence). */
  private[graft] val pairsExpr = expr(
    """CASE WHEN size(split(word, '\\|')) >= 3
      |  THEN transform(sequence(1, size(split(word, '\\|')) - 2),
      |         i -> concat('|', split(word, '\\|')[i], '|', split(word, '\\|')[i + 1]))
      |  ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin)

  // NOTE (r16): the one-Spark-job-per-merge-round trainer (`trainMerges`)
  // is RETIRED from the production surface — strictly dominated by
  // [[trainMergesFast]] (identical merges, ~80× faster at depth,
  // SCALING.md r15) and needed only as the cross-engine equality anchor.
  // It lives on in TEST scope as `BpeReferenceTrainer.trainMerges`,
  // where BpeSpec still pins fast ≡ reference merge-for-merge.

  /** Merge depth beyond which [[tokenize]] dispatches to
    * [[tokenizeFast]]: the codegen'd replace chain nests one builtin
    * call per merge per word — ideal at gate depth, a generated-method-
    * size hazard at production depth (the 64 KB JVM method ceiling and
    * the JIT's inlining budget both lose well before 1k nested calls). */
  val ReplaceChainMaxMerges = 64

  /** Apply the ranked merges to every doc: (id, n_bpe_tokens, tokens_md5,
    * tokens_str). Up to [[ReplaceChainMaxMerges]] merges the chain folds
    * into builtin `replace` calls inside one `transform` — fully
    * codegen'd, no shuffle; deeper stacks run the bit-equal
    * [[tokenizeFast]] mapPartitions twin. */
  def tokenize(docs: DataFrame, idCol: String, textCol: String, merges: Seq[String]): DataFrame =
    if (merges.size > ReplaceChainMaxMerges) tokenizeFast(docs, idCol, textCol, merges)
    else tokenizeChain(docs, idCol, textCol, merges)

  private[graft] def tokenizeChain(
      docs: DataFrame, idCol: String, textCol: String, merges: Seq[String]): DataFrame = {
    val mergedWords = transform(
      wordsExpr(textCol),
      w =>
        merges.foldLeft(regexp_replace(w, "(.)", "|$1")) { (acc, bp) =>
          replace(acc, lit(bp), lit(repOf(bp)))
        })
    withTokenStats(docs.select(col(idCol), concat_ws(" ", mergedWords).as("tokens_str")), idCol)
  }

  /** The canonical output projection over (idCol, tokens_str) — ONE
    * definition of the token-count arithmetic for both apply twins (the
    * oracle hashes exactly these columns; two copies could drift). */
  private def withTokenStats(rendered: DataFrame, idCol: String): DataFrame =
    rendered.select(
      col(idCol),
      // each token is exactly one '|' cell — token count = '|' count
      (length(col("tokens_str")) - length(replace(col("tokens_str"), lit("|"), lit(""))))
        .cast("long")
        .as("n_bpe_tokens"),
      md5(col("tokens_str")).as("tokens_md5"),
      col("tokens_str"))

  // ------------------------------------------------------------------
  // PRODUCTION-SCALE training + application (r15). The retired per-round
  // trainer ran one Spark job per merge round — fine at gate scale (30
  // merges), but a realistic 32k-merge vocab would be 32k jobs. The scale
  // recipe is the classic trainer's (Sennrich et al. 2016, learn_bpe —
  // public algorithm): the CORPUS-scale work (word counting) stays
  // distributed and runs ONCE; the merge recurrence then runs
  // driver-side over the distinct-WORD table with INCREMENTAL
  // pair-count maintenance — each round touches only the words that
  // contain the chosen pair, so per-round cost tracks that pair's word
  // set, not the vocab, and there is no per-round Spark job at all.
  // The word table is metadata-scale relative to the corpus (distinct
  // natural-language words: millions at 100 TB — the IVF-codebook
  // class), guarded by a LOUD cap + a deterministic minWordFreq
  // pre-filter for the long tail. Application at deep merge stacks is
  // [[tokenizeFast]] — a mapPartitions twin of the replace chain (the
  // N-deep chain stops being codegen-friendly past ~10² merges).
  // BpeSpec pins both twins equal to the Spark-side originals
  // merge-for-merge and token-for-token.
  // ------------------------------------------------------------------

  /** The incremental trainer: the classic merge sequence (same counts,
    * same (freq DESC, pattern ASC) argmax, same greedy left-to-right
    * vocab update as the per-round-job reference twin, BpeSpec-pinned),
    * one distributed corpus aggregation + a driver-side loop instead of
    * nMerges Spark jobs.
    *
    * @param minWordFreq  drop vocab words rarer than this BEFORE
    *                     training — the standard long-tail economy.
    *                     Default 1 (keep all) because it CHANGES the
    *                     trained merges; raise it deliberately.
    * @param maxVocabWords loud driver-memory guard: training refuses
    *                     (with the minWordFreq remedy) rather than
    *                     silently OOMing or truncating. */
  /** Test observability: how many times a full training pass ran in this
    * JVM — the persisted-model specs assert a restart SERVES instead of
    * retraining. */
  private[graft] val trainInvocations = new java.util.concurrent.atomic.AtomicLong(0L)

  def trainMergesFast(
      docs: DataFrame,
      textCol: String,
      nMerges: Int = NMerges,
      minWordFreq: Long = 1L,
      maxVocabWords: Int = 10000000): Seq[String] = {
    trainInvocations.incrementAndGet(): Unit
    val vocabDf = docs
      .select(explode(wordsExpr(textCol)).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("f"))
      .filter(col("f") >= minWordFreq)
      .persist()
    try {
      // the guard must fire BEFORE the collect it protects: count the
      // (persisted) vocab first, refuse loudly, only then pull it
      val n = vocabDf.count()
      require(n <= maxVocabWords,
        s"BPE vocab has $n distinct words (> $maxVocabWords cap) — raise " +
          "maxVocabWords if the driver can hold it, or set minWordFreq to drop the long tail " +
          "(changes the trained merges, as any vocab pre-filter does)")
      val raw: Array[(String, Long)] =
        vocabDf.collect().map(r => (r.getString(0), r.getLong(1)))
      trainOnVocab(raw, nMerges)
    } finally vocabDf.unpersist()
  }

  /** The driver-side recurrence over a (word, freq) table.
    *
    * Semantics note — the recurrence's DEFINITION is the literal string
    * `replace` on the cell encoding (what the reference twin, [[tokenize]]
    * and the DuckDB oracle all run), which is NOT always a symbol-aware
    * merge: a pattern's trailing symbol can match a PREFIX of a longer
    * symbol ("|aa|aa" under merge "|aa|a" → "|aaaa", absorbing a
    * partial cell). Ranking still counts split-aligned pairs (the
    * pairsExpr definition). This twin replicates both exactly — words
    * stay cell-encoded STRINGS, rewrites are Java String.replace (same
    * literal left-to-right non-overlapping contract), and candidate
    * words per round come from a (symbol, next-first-char) index that
    * covers prefix-matching occurrences too, confirmed by a substring
    * check. Patterns compare as ASCII (words are [a-z]+ runs, so Java
    * UTF-16 order ≡ the engines' UTF-8 order). */
  private[graft] def trainOnVocab(raw: Array[(String, Long)], nMerges: Int): Seq[String] = {
    import scala.collection.mutable
    val words: Array[String] = raw.map(r => r._1.flatMap(c => "|" + c))
    val freqs: Array[Long] = raw.map(_._2)
    val counts = mutable.HashMap.empty[String, Long] // "|a|b" -> freq-weighted pair count
    // (symbol, first char of the NEXT symbol) -> word idxs: a superset
    // index over substring occurrences — pattern "|a|b" can only occur
    // where symbol a is followed by a symbol STARTING with b
    val occ = mutable.HashMap.empty[(String, Char), mutable.Set[Int]]
    def withPairs(idx: Int)(f: (String, String) => Unit): Unit = {
      val sym = words(idx).split("\\|")
      var i = 1
      while (i < sym.length - 1) { f(sym(i), sym(i + 1)); i += 1 }
    }
    def index(idx: Int): Unit = withPairs(idx) { (a, b) =>
      counts.update("|" + a + "|" + b, counts.getOrElse("|" + a + "|" + b, 0L) + freqs(idx))
      occ.getOrElseUpdate((a, b.head), mutable.Set.empty) += idx
    }
    def retract(idx: Int): Unit = withPairs(idx) { (a, b) =>
      val p = "|" + a + "|" + b
      val c = counts.getOrElse(p, 0L) - freqs(idx)
      if (c == 0L) counts.remove(p) else counts.update(p, c)
      occ.get((a, b.head)).foreach(_ -= idx)
    }
    words.indices.foreach(index)
    val merges = Seq.newBuilder[String]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      if (counts.isEmpty) done = true
      else {
        // argmax (count DESC, pattern ASC) — the trainMerges orderBy
        var bestP: String = null; var bestC = Long.MinValue
        counts.foreach { case (p, c) =>
          if (c > bestC || (c == bestC && p < bestP)) { bestP = p; bestC = c }
        }
        merges += bestP
        val parts = bestP.split("\\|") // ["", a, b]
        val rep = repOf(bestP)
        val candidates = occ.getOrElse((parts(1), parts(2).head), mutable.Set.empty)
          .toArray.sorted
        candidates.foreach { idx =>
          if (words(idx).contains(bestP)) {
            retract(idx)
            words(idx) = words(idx).replace(bestP, rep)
            index(idx)
          }
        }
      }
      r += 1
    }
    merges.result()
  }

  /** Replace-chain application, mapPartitions twin — the deep-stack
    * path: the fold of N builtin `replace`s codegens N nested calls per
    * word (fine at 30, a generated-method-size / JIT hazard at 1k+).
    * Semantics are EXACTLY the chain's — the same literal left-to-right
    * non-overlapping replace per merge in rank order, Java
    * String.replace sharing that contract with Spark's and DuckDB's —
    * including the prefix-absorbing corner the cell encoding permits
    * (see [[trainOnVocab]]) and duplicate patterns in the stack.
    * Per-partition word memoization makes the fold cost per DISTINCT
    * word, not per token — the same vocab-not-corpus economy as
    * training. Output schema and arithmetic are [[tokenize]]'s (BpeSpec
    * pins token-for-token equality). */
  def tokenizeFast(
      docs: DataFrame, idCol: String, textCol: String, merges: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    val bcMerges = spark.sparkContext.broadcast(
      merges.toArray.map(bp => (bp, repOf(bp))))
    val base = docs.select(col(idCol), wordsExpr(textCol).as("__ws"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      base.schema.head,
      org.apache.spark.sql.types.StructField(
        "tokens_str", org.apache.spark.sql.types.StringType, nullable = false)))
    implicit val enc: org.apache.spark.sql.Encoder[org.apache.spark.sql.Row] =
      org.apache.spark.sql.Encoders.row(outSchema)
    val rendered = base.mapPartitions { it =>
      val ms = bcMerges.value
      val memo = new java.util.HashMap[String, String]()
      def mergedOf(w: String): String = {
        val hit = memo.get(w)
        if (hit != null) hit
        else {
          var s = w.flatMap(c => "|" + c)
          var i = 0
          while (i < ms.length) {
            val (bp, rep) = ms(i)
            // String.contains pre-check: replace allocates on every call,
            // and most merges never occur in a given word
            if (s.contains(bp)) s = s.replace(bp, rep)
            i += 1
          }
          memo.put(w, s)
          s
        }
      }
      it.map { row =>
        val ws = if (row.isNullAt(1)) Seq.empty[String] else row.getSeq[String](1)
        org.apache.spark.sql.Row(row.get(0), ws.map(mergedOf).mkString(" "))
      }
    }
    withTokenStats(rendered, idCol)
  }

  // ------------------------------------------------------------------
  // PERSISTED TOKENIZER MODEL (r16). A trained merge list previously
  // lived only in the in-JVM cache — every restart retrained, unlike the
  // PQ/IVF models which persist. The model artifact is one parquet of
  // (rank, merge) rows plus the trainer params and a CONTENT FINGERPRINT
  // on every row (the savePqModel discipline): loading refuses a
  // non-dense rank set loudly, and a fingerprint mismatch means the
  // model was trained on DIFFERENT data/params — serving it would be
  // silently wrong token ids, so [[trainOrLoadMerges]] retrains instead.
  // ------------------------------------------------------------------

  final case class BpeModel(
      merges: Seq[String],
      textCol: String,
      nMerges: Int,
      minWordFreq: Long,
      fingerprint: String)

  /** Content fingerprint of a corpus frame: the resolved plan's semantic
    * hash (covers the DEFINITION — path, filters, literal relations)
    * plus each input file's (path, mtime, len) generation — the
    * DataFileId discipline shared with the TVF cache below. Metadata-
    * scale: one file-status call per input file. */
  def contentFingerprint(df: DataFrame): String = {
    val spark = df.sparkSession
    val planKey = df.queryExecution.analyzed.semanticHash()
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    // inputFiles are LISTING-space names (Path.toString — unencoded):
    // feed them to Path(String) verbatim, never through java.net.URI
    // (a Hive-escaped partition dir like part=t%3Acolon would decode,
    // a space would throw URISyntaxException — the FileIO.relPath rule)
    val fileKey = df.inputFiles.sorted.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val st = p.getFileSystem(hadoopConf).getFileStatus(p)
      s"$f#${st.getModificationTime}#${st.getLen}"
    }.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$planKey\n$fileKey".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Persist a trained tokenizer: one row per merge in rank order, the
    * trainer params + fingerprint on every row. Merges are plain ASCII
    * strings — the artifact round-trips bit-exactly (BpeSpec pins
    * load(save(m)) tokenizes identically). */
  def saveBpeModel(spark: SparkSession, model: BpeModel, path: String): Unit = {
    import spark.implicits._
    model.merges.zipWithIndex
      .map { case (bp, rank) =>
        (rank, bp, model.textCol, model.nMerges, model.minWordFreq, model.fingerprint)
      }
      .toDF("rank", "merge", "text_col", "n_merges", "min_word_freq", "fingerprint")
      .coalesce(1)
      .write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path)
  }

  /** Load a tokenizer persisted by [[saveBpeModel]] — refuses non-dense
    * ranks or inconsistent params loudly (not a saveBpeModel artifact). */
  def loadBpeModel(spark: SparkSession, path: String): BpeModel = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select(col("rank"), col("merge"), col("text_col"), col("n_merges"),
        col("min_word_freq"), col("fingerprint"))
      .as[(Int, String, String, Int, Long, String)]
      .collect()
      .sortBy(_._1)
    require(rows.nonEmpty, s"no BPE model rows at $path")
    require(rows.map(_._1).toSeq == rows.indices.toSeq,
      s"non-dense merge ranks at $path — not a saveBpeModel artifact")
    val metas = rows.map(r => (r._3, r._4, r._5, r._6)).distinct
    require(metas.length == 1,
      s"inconsistent trainer params at $path: $metas — not a saveBpeModel artifact")
    val (textCol, nMerges, minWordFreq, fp) = metas.head
    BpeModel(rows.map(_._2).toSeq, textCol, nMerges, minWordFreq, fp)
  }

  /** Serve the merges from a FRESH persisted model, else train-and-save:
    * fresh means the stored fingerprint equals the corpus' CURRENT
    * [[contentFingerprint]] and the trainer params match — a stale or
    * foreign model retrains and overwrites rather than silently serving
    * wrong token ids. The train-once/tokenize-forever lifecycle across
    * JVM restarts, exactly the savePqModel/loadPqModel contract. */
  def trainOrLoadMerges(
      docs: DataFrame,
      textCol: String,
      nMerges: Int,
      modelPath: String,
      minWordFreq: Long = 1L): Seq[String] = {
    val spark = docs.sparkSession
    val fp = contentFingerprint(docs)
    val fs = new org.apache.hadoop.fs.Path(modelPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val served: Option[Seq[String]] =
      if (!fs.exists(new org.apache.hadoop.fs.Path(modelPath))) None
      else {
        val m = loadBpeModel(spark, modelPath)
        if (m.fingerprint == fp && m.textCol == textCol &&
          m.nMerges == nMerges && m.minWordFreq == minWordFreq) Some(m.merges)
        else None
      }
    served.getOrElse {
      val merges = trainMergesFast(docs, textCol, nMerges, minWordFreq)
      saveBpeModel(spark, BpeModel(merges, textCol, nMerges, minWordFreq, fp), modelPath)
      merges
    }
  }

  /** Trained merges per (application, fixture): training is paid once per
    * JVM; the three gated queries (tokens / budget / pack) share it — the
    * production shape too: train once, tokenize many. */
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
  private[graft] def clearMergeCacheForTest(): Unit = mergeCache.clear()
  /** documents repartitioned by id — tokenize parallelism independent of
    * the (single-row-group) fixture file layout; see text_bpe_tokens. */
  private def docsParallel(spark: SparkSession, dir: String) =
    Tables.documents(spark, dir).repartition(
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt, col("doc_id"))

  private[graft] def fixtureMerges(spark: SparkSession, dir: String): Seq[String] =
    mergeCache.computeIfAbsent(
      s"${spark.sparkContext.applicationId}:$dir",
      _ => trainMergesFast(Tables.documents(spark, dir), "text", NMerges))

  /** Trained merges for the `graft_bpe_tokenize` TVF, cached per
    * (application, CONTENT SNAPSHOT, textCol, nMerges) — NOT per table
    * name: re-registering DIFFERENT contents under the same view name
    * retrains instead of silently serving the first corpus' merges
    * (wrong token ids), while repeated calls and plan-only paths
    * (EXPLAIN) over unchanged contents still pay training once. The
    * snapshot key is the resolved plan's semantic hash (covers the view
    * DEFINITION — a different path, filter, or literal relation changes
    * it) plus, for file-backed tables, each input file's
    * (path, mtime, len) generation — so an in-place rewrite or append
    * under the SAME definition retrains too (the DataFileId
    * discipline). Listing cost is one metadata call per input file per
    * TVF invocation — the same class as the sidecar staleness gates. */
  private[graft] def mergesForTable(
      spark: SparkSession, tableName: String, textCol: String, n: Int): Seq[String] = {
    val df = spark.table(tableName)
    val digest = contentFingerprint(df)
    mergeCache.computeIfAbsent(
      s"${spark.sparkContext.applicationId}:tvf:$digest:$textCol:$n",
      _ =>
        // with a model store configured, the in-JVM miss falls through to
        // the PERSISTED model (digest-addressed, fingerprint-verified) —
        // a restarted application serves the trained tokenizer instead of
        // retraining; without one, behavior is the r15 train-per-JVM
        spark.conf.getOption("spark.graft.bpe.modelDir") match {
          case Some(root) =>
            trainOrLoadMerges(df, textCol, n, s"$root/bpe_${digest}_${textCol}_$n")
          case None => trainMergesFast(df, textCol, n)
        })
  }

  val queries: Map[String, Q] = Map(
    // Train-and-tokenize gate: per doc, the BPE token count and an md5 of
    // the full merged-token string — one flipped merge anywhere in the
    // recurrence flips the hash, so the gate pins the ENTIRE (train,
    // apply) pipeline against DuckDB's sequential recomputation.
    "text_bpe_tokens" -> { (spark, dir) =>
      // deliberately NOT repartitioned like its two sibling gates: this
      // gate's single tokenize pass is cheap enough (0.13 s median) that
      // the extra shuffle measured as a net loss (r18 A/B: 0.13 s plain
      // vs 0.19 s repartitioned); the siblings' multi-consumer plans
      // amortize the shuffle and keep docsParallel.
      Bpe
        .tokenize(Tables.documents(spark, dir), "doc_id", "text", fixtureMerges(spark, dir))
        .select(col("doc_id"), col("n_bpe_tokens"), col("tokens_md5"))
        .orderBy(col("doc_id"))
    },

    // The SQL spelling: graft_bpe_tokenize trains AND applies from one
    // table-function call — same oracle BY REFERENCE as
    // text_bpe_tokens, so a SQL-only user gets identical token ids.
    "sql_bpe_tokens" -> { (spark, dir) =>
      graft.functions.GraftExtensions.register(spark)
      Tables.documents(spark, dir).createOrReplaceTempView("graft_docs_bpe")
      spark.sql(
        s"""SELECT doc_id, n_bpe_tokens, tokens_md5
           |FROM graft_bpe_tokenize('graft_docs_bpe', 'doc_id', 'text', $NMerges)
           |ORDER BY doc_id""".stripMargin)
    },

    // select_token_budget re-pointed at REAL token ids: same greedy
    // per-lang selection window, but the budget counts BPE tokens — the
    // quantity a training run actually pays for.
    "select_token_budget_bpe" -> { (spark, dir) =>
      val docs = Tables.documents(spark, dir)
      val counts = Bpe
        .tokenize(docsParallel(spark, dir), "doc_id", "text", fixtureMerges(spark, dir))
        .select(col("doc_id"), col("n_bpe_tokens").as("nt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang"))
        .orderBy(col("n_chars").desc, col("doc_id").asc)
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      docs
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .join(counts, Seq("doc_id"))
        .withColumn("cum_tokens", sum(col("nt")).over(w))
        .filter(col("cum_tokens") - col("nt") < BpeBudget)
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_selected"),
          sum(col("nt")).cast("long").as("tokens_selected"),
          min(col("n_chars")).as("min_chars_kept"))
        .orderBy(col("lang"))
    },

    // pack_chunks re-pointed at REAL token ids: the packed-pretraining
    // layout cut every 2048 BPE tokens — same two-pass distributed
    // cumsum, token counts from the learned tokenizer.
    "pack_chunks_bpe" -> { (spark, dir) =>
      Chunking
        .packChunksCounted(
          Bpe
            .tokenize(docsParallel(spark, dir), "doc_id", "text", fixtureMerges(spark, dir))
            .select(col("doc_id"), col("n_bpe_tokens").as("n_tokens")),
          2048)
        .orderBy(col("doc_id"))
    }
  )

  /** The shared training+application CTE chain (DuckDB spelling of the
    * same recurrence): `a@iter=N` holds every doc word fully merged;
    * downstream SELECTs differ per gate. */
  private def bpeChain(n: Int): String =
    s"""WITH RECURSIVE
       |cw AS (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents),
       |vocab0 AS (SELECT w, COUNT(*) AS f FROM cw GROUP BY w),
       |enc0 AS (SELECT regexp_replace(w, '(.)', '|\\1', 'g') AS word, f FROM vocab0),
       |v(iter, word, f, bp) AS (
       |  SELECT 0, word, f, CAST(NULL AS VARCHAR) FROM enc0
       |  UNION ALL
       |  SELECT iter + 1,
       |    CASE WHEN bp2 IS NULL THEN word
       |         ELSE replace(word, bp2, '|' || replace(substr(bp2, 2), '|', '')) END,
       |    f, bp2
       |  FROM (
       |    SELECT iter, word, f,
       |      (SELECT pr FROM (
       |         SELECT pr, SUM(f2) AS c FROM (
       |           SELECT '|' || s2[i] || '|' || s2[i+1] AS pr, f2
       |           FROM (SELECT f AS f2, string_split(word, '|') AS s2 FROM v) q,
       |                LATERAL unnest(generate_series(2, len(s2) - 1)) AS t(i)
       |         ) GROUP BY pr ORDER BY c DESC, pr ASC LIMIT 1)
       |      ) AS bp2
       |    FROM v WHERE iter < $n)
       |),
       |merges AS (SELECT DISTINCT iter, bp FROM v WHERE bp IS NOT NULL),
       |dw AS (
       |  SELECT doc_id, i AS pos,
       |    regexp_replace(ws[i], '(.)', '|\\1', 'g') AS word
       |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws FROM documents) q,
       |       LATERAL unnest(generate_series(1, len(ws))) AS u(i)),
       |a(iter, doc_id, pos, word) AS (
       |  SELECT 0, doc_id, pos, word FROM dw
       |  UNION ALL
       |  SELECT a.iter + 1, a.doc_id, a.pos,
       |    CASE WHEN m.bp IS NULL THEN a.word
       |         ELSE replace(a.word, m.bp, '|' || replace(substr(m.bp, 2), '|', '')) END
       |  FROM a LEFT JOIN merges m ON m.iter = a.iter + 1
       |  WHERE a.iter < $n),
       |perdoc AS (
       |  SELECT d.doc_id,
       |    COALESCE(CAST(SUM(len(word) - len(replace(word, '|', ''))) AS BIGINT), 0) AS nt,
       |    md5(COALESCE(string_agg(word, ' ' ORDER BY pos), '')) AS tokens_md5
       |  FROM documents d LEFT JOIN (SELECT * FROM a WHERE iter = $n) f ON d.doc_id = f.doc_id
       |  GROUP BY d.doc_id)""".stripMargin

  private lazy val bpeTokensOracle: String =
    s"""${bpeChain(NMerges)}
       |SELECT doc_id, nt AS n_bpe_tokens, tokens_md5
       |FROM perdoc ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "text_bpe_tokens" -> bpeTokensOracle,
    // TVF spelling shares the contract by reference
    "sql_bpe_tokens" -> bpeTokensOracle,
    "select_token_budget_bpe" ->
      s"""${bpeChain(NMerges)},
         |t AS (
         |  SELECT d.doc_id, d.lang, d.n_chars, p.nt,
         |    SUM(p.nt) OVER (PARTITION BY d.lang
         |      ORDER BY d.n_chars DESC, d.doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM documents d JOIN perdoc p ON d.doc_id = p.doc_id)
         |SELECT lang, COUNT(*) AS n_selected,
         |  CAST(SUM(nt) AS BIGINT) AS tokens_selected,
         |  MIN(n_chars) AS min_chars_kept
         |FROM t WHERE cum - nt < $BpeBudget
         |GROUP BY lang ORDER BY lang""".stripMargin,
    "pack_chunks_bpe" ->
      s"""${bpeChain(NMerges)},
         |t AS (
         |  SELECT doc_id, nt AS n_tokens,
         |    SUM(nt) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM perdoc)
         |SELECT doc_id, n_tokens, CAST(cum - n_tokens AS BIGINT) AS start_off,
         |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS chunk_first,
         |  CAST((cum - 1) // 2048 AS BIGINT) AS chunk_last,
         |  CAST((cum - 1) // 2048 - (cum - n_tokens) // 2048 + 1 AS BIGINT) AS n_chunks_spanned
         |FROM t ORDER BY doc_id""".stripMargin
  )
}
