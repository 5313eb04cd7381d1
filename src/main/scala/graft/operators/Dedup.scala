package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Sub-linear near-duplicate detection: MinHash-LSH and SimHash
  * (SURVEY §2.2 "near-dup: MinHash/LSH over shingles"; SURVEY.md:253).
  *
  * Both operators follow the same scale-safe shape — NEVER all-pairs:
  *   per-doc signature (pure map, no shuffle)
  *     → explode band/block keys (rows ×B, B small)
  *     → equi-join on the key (shuffle bounded by bucket sizes)
  *     → exact verification of candidates only.
  * The verification step recomputes true Jaccard on the candidate pairs,
  * so false positives cost compute but never correctness; false-negative
  * probability is driven to ~0 by the band parameters (16 bands × 4 rows:
  * P(miss | J=0.9) = (1−0.9⁴)¹⁶ ≈ 3·10⁻⁸).
  *
  * Determinism: the hash family is a fixed affine family over xxhash64
  * seeded with constants from Random(42) — the same inputs always produce
  * the same candidates, so the DuckDB oracle (exact all-pairs Jaccard,
  * feasible at verification SF) checks the full output exactly.
  *
  * At 100 TB the one extra guard is the bucket-size cap
  * (SkewTools.dropHotKeys, applied before every band/block self-join
  * here): a crawl's boilerplate text creates mega-buckets, and one
  * uncapped bucket is a quadratic blowup. Fixture caps sit above the
  * measured bucket maxima, so the oracle gates prove the guard is a
  * no-op on honest data; DedupSkewSpec proves it bounds the join on a
  * boilerplate-heavy corpus.
  */
object Dedup {
  type Q = (SparkSession, String) => DataFrame

  private val NumHashes = 64
  private val Bands = 16
  private val RowsPerBand = 4 // Bands * RowsPerBand == NumHashes
  private val BucketCap = 500 // >> max fixture bucket; the 100 TB guard

  /** (doc_id, h) distinct shingle-hash rows — whole-stage codegen via
    * TextOps.shingleRows + a top-level xxhash64. Input to both signature
    * computations; higher-order functions stay OUT of the per-shingle
    * hot path (the round-2 bench measured the nested-HOF formulation of
    * the signature at ~450 s on sf0.1 vs seconds for this shape).
    */
  private def hashRows(d: DataFrame): DataFrame =
    TextOps.shingleRows(d, 3).select(col("doc_id"), xxhash64(col("s")).as("h"))

  /** Per-doc shingle-hash arrays (for exact-Jaccard verification of the
    * few candidate pairs only). */
  private def hashArrays(hr: DataFrame): DataFrame =
    hr.groupBy(col("doc_id")).agg(collect_list(col("h")).as("hs"))

  /** Indexed hash family hᵢ(x) = rotl(x, rᵢ) ⊕ cᵢ — bijective cheap bit
    * mixing over the already-xxhash64'd shingle (overflow-free under ANSI
    * arithmetic, whole-stage-codegen'd). Family quality is pinned
    * empirically: the oracle gate requires zero false negatives vs exact
    * all-pairs Jaccard. */
  private val mixConsts = {
    val rnd = new scala.util.Random(42)
    Array.fill(NumHashes)(rnd.nextLong())
  }
  private def mix(h: Column, i: Int): Column = {
    val r = (i * 7) % 63 + 1
    (shiftleft(h, r).bitwiseOR(shiftrightunsigned(h, 64 - r))).bitwiseXOR(lit(mixConsts(i)))
  }

  /** Exact Jaccard verification on candidate pairs: join back the distinct
    * shingle-hash arrays, intersect in-row. */
  private def verified(cands: DataFrame, sh: DataFrame, threshold: Double): DataFrame =
    cands
      .join(sh.select(col("doc_id").as("d1"), col("hs").as("hs1")), "d1")
      .join(sh.select(col("doc_id").as("d2"), col("hs").as("hs2")), "d2")
      .select(
        col("d1"),
        col("d2"),
        (size(array_intersect(col("hs1"), col("hs2"))).cast("double") /
          (size(col("hs1")) + size(col("hs2")) - size(array_intersect(col("hs1"), col("hs2")))))
          .as("jaccard")
      )
      .filter(col("jaccard") >= threshold)
      .orderBy(col("d1"), col("d2"))

  /** MinHash-LSH near-duplicate pairs (d1 < d2, exact jaccard ≥
    * threshold) over any (doc_id, text) frame: explode shingle hashes →
    * 64 codegen min-aggregates (map-side partial agg: the shuffle
    * carries one 64-long row per doc) → 16 band keys → capped bucket
    * join → exact-Jaccard verify of candidates only. Shared by the
    * dedup_minhash_lsh query and the `graft_minhash_pairs` SQL table
    * function. */
  def minhashPairs(d: DataFrame, threshold: Double): DataFrame = {
    // hr feeds the 64-way signature aggregate AND the verification
    // arrays; the exploded band rows feed the hot-key counts, the
    // anti-join input, and both self-join sides. Materialize each once
    // (r19) — without it the shingle flatMap ran twice and the 64-min
    // aggregate three times per query (measured via JobProbe at sf0.1).
    // At scale the signature table is exactly what an LSH pipeline
    // persists between stages.
    val hr = hashRows(d).localCheckpoint()
    val minCols = (0 until NumHashes).map(i => min(mix(col("h"), i)).as(s"m$i"))
    val sig = hr.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
    val bandCols = (0 until Bands).map { b =>
      xxhash64((0 until RowsPerBand).map(r => col(s"m${b * RowsPerBand + r}")): _*)
    }
    val bandRows = sig.select(
      col("doc_id"),
      posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_key"))
    ).localCheckpoint()
    val bands = SkewTools.dropHotKeys(bandRows, Seq("band_idx", "band_key"), BucketCap)
    val cands = bands
      .as("x")
      .join(
        bands.as("y"),
        col("x.band_idx") === col("y.band_idx") && col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id")
      )
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    verified(cands, hashArrays(hr), threshold)
  }

  /** SPAN-LEVEL exact dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better": remove every TOKEN SPAN that
    * appears verbatim elsewhere in the corpus, not just whole-document
    * duplicates — cross-document boilerplate, license headers, and
    * quoted passages survive every doc-level dedup above, and this is
    * the published fix). A token is duplicated iff some k-token window
    * containing it occurs in ≥2 distinct documents.
    *
    * Returns (doc_id, pos) for every duplicated token position. Shape:
    *   per-doc positional k-shingles (pure array map — sequence +
    *   slice + array_join, whole-stage codegen, no window, no shuffle)
    *     → duplicated-shingle set via one partial-aggregated groupBy
    *     → occurrences ⋈ dup-set equi-join (1 row per dup shingle on
    *       the build side — linear, never a self-join)
    *     → explode each hit's k covered positions, dedup in the per-doc
    *       collect_set downstream.
    * At 100 TB: set `fingerprint = true` to group/join on a 64-bit
    * xxhash64 shingle fingerprint instead of the string — a k=8 word
    * shingle averages ~50 bytes, so the fingerprint cuts the groupBy and
    * join shuffle width ~6× (collision odds ~n²/2⁶⁵: a colliding pair
    * marks at most k extra positions in the colliding docs; the fixture
    * gate keeps the exact string so the oracle is collision-free by
    * construction, and `dedup_span_fp` gates the fingerprint spelling
    * against the SAME oracle — collision-free at fixture scale). A
    * stop-shingle cap à la [[SkewTools.dropHotKeys]] is unnecessary —
    * the dup-set side is one row per shingle value, so hot shingles cost
    * a skewed-but-linear probe, which AQE skew-split handles. */
  def duplicateSpanPositions(docs: DataFrame, k: Int, fingerprint: Boolean = false): DataFrame = {
    val ts = docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
    val shStr = ts
      .filter(size(col("ts")) >= k)
      .select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0), size(col("ts")) - k),
            p => array_join(slice(col("ts"), p + 1, lit(k)), " "))).as(Seq("pos", "shingle")))
    // the fingerprint replaces the string BEFORE the shuffle — both the
    // dup-set groupBy and the occurrences join move 8-byte keys
    val sh =
      if (fingerprint)
        shStr.select(col("doc_id"), col("pos"), xxhash64(col("shingle")).as("shingle"))
      else shStr
    val dup = sh
      .groupBy(col("shingle"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("shingle"))
    sh.join(dup, Seq("shingle"))
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + lit(k - 1))).as("pos"))
  }

  /** The REMOVAL composed on top: per doc, the token count, the count of
    * duplicated token positions, and the cleaned text with every
    * duplicated span's tokens dropped (single-space re-join — the
    * Lee-et-al. output contract). Covered positions collapse into one
    * per-doc set (collect_set — spans overlap, the set dedups), then the
    * token array is filtered BY INDEX in one codegen'd higher-order
    * filter — no per-token shuffle, no ordered string_agg. */
  def removeDuplicateSpans(docs: DataFrame, k: Int, fingerprint: Boolean = false): DataFrame = {
    val covSets = duplicateSpanPositions(docs, k, fingerprint)
      .groupBy(col("doc_id"))
      .agg(collect_set(col("pos")).as("cps"))
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .join(covSets, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        size(col("ts")).cast("long").as("n_tokens"),
        coalesce(size(col("cps")), lit(0)).cast("long").as("n_dup_tokens"),
        array_join(
          filter(col("ts"), (_, i) => !array_contains(coalesce(col("cps"), array()), i)),
          " ").as("clean_text"))
  }

  val queries: Map[String, Q] = Map(
    // Span-level exact dedup at k=8 (see removeDuplicateSpans): the
    // gate hashes the CLEANED TEXT per doc, so the oracle round-trips
    // the whole pipeline — shingle extraction, dup-set, coverage,
    // reconstruction — not just the counts. ~1000 duplicated shingles
    // exist in the fixture corpus (measured), so the gate exercises
    // real cross-doc span removal, overlapping spans included.
    "dedup_span_exact" -> { (spark, dir) =>
      removeDuplicateSpans(Tables.documents(spark, dir), k = 8)
        .select(
          col("doc_id"),
          col("n_tokens"),
          col("n_dup_tokens"),
          md5(col("clean_text")).as("clean_hash"))
        .orderBy(col("doc_id"))
    },

    // The FINGERPRINT spelling (the documented 100 TB shuffle-width
    // path): identical plan except both span shuffles move an 8-byte
    // xxhash64 of each shingle instead of the ~50-byte string. Gated
    // against the SAME oracle — fixture scale is collision-free by
    // construction, so a hash mismatch here means the rewrite broke
    // semantics, not that a collision fired.
    "dedup_span_fp" -> { (spark, dir) =>
      removeDuplicateSpans(Tables.documents(spark, dir), k = 8, fingerprint = true)
        .select(
          col("doc_id"),
          col("n_tokens"),
          col("n_dup_tokens"),
          md5(col("clean_text")).as("clean_hash"))
        .orderBy(col("doc_id"))
    },

    // The SQL spelling: the same span-removal plan reached through the
    // graft_span_dedup TABLE FUNCTION (GraftExtensions), same oracle by
    // reference — a SQL-only user gets Lee-et-al. span dedup without
    // touching the Scala API.
    "sql_span_dedup" -> { (spark, dir) =>
      graft.functions.GraftExtensions.register(spark)
      Tables.documents(spark, dir).createOrReplaceTempView("graft_docs")
      spark.sql(
        """SELECT doc_id, n_tokens, n_dup_tokens, md5(clean_text) AS clean_hash
          |FROM graft_span_dedup('graft_docs', 'doc_id', 'text', 8)
          |ORDER BY doc_id""".stripMargin)
    },

    // MinHash-LSH near-dup, J ≥ 0.6 — see minhashPairs above.
    "dedup_minhash_lsh" -> { (spark, dir) =>
      minhashPairs(Tables.documents(spark, dir), 0.6)
    },

    // The SQL spelling: same operator reached through the
    // graft_minhash_pairs TABLE FUNCTION (GraftExtensions), same
    // exact-all-pairs oracle — a SQL-only user gets the engine's
    // near-dup join without touching the Scala API.
    "sql_minhash_pairs" -> { (spark, dir) =>
      graft.functions.GraftExtensions.register(spark)
      Tables.documents(spark, dir).createOrReplaceTempView("graft_docs")
      spark.sql(
        "SELECT d1, d2, jaccard FROM graft_minhash_pairs('graft_docs', 'doc_id', 'text', 0.6)")
    },

    // SimHash near-dup: 64-bit sign-tally fingerprint over shingle
    // hashes. Measured on the fixture corpus, J≥0.9 pairs sit at hamming
    // 0-10 and unrelated pairs at ≥14, so the cut is hamming ≤ 12 —
    // candidates found EXACTLY via the pigeonhole block join (13 blocks
    // of ≤5 bits: any pair within distance 12 shares ≥1 identical block);
    // exact-Jaccard verify at 0.9 removes block-collision false
    // positives.
    "dedup_simhash" -> { (spark, dir) =>
      // hr feeds the bit-tally aggregate AND the verification arrays —
      // materialize once (the minhashPairs fix, r19)
      val hr = hashRows(Tables.documents(spark, dir)).localCheckpoint()
      // bit_j = majority of bit j across shingle hashes — 64 codegen'd
      // sum-aggregates over the hash rows (same shape rationale as
      // dedup_minhash_lsh: no HOFs in the per-shingle path).
      val bitSums = (0 until 64).map(j =>
        sum(shiftrightunsigned(col("h"), j).bitwiseAND(lit(1L))).as(s"s$j"))
      val tallies = hr
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("cnt"), bitSums: _*)
      // Pack the 64 majority bits into ONE long: hamming becomes
      // bit_count(x ⊕ y) — a codegen'd intrinsic per candidate pair, not
      // an interpreted 64-element array walk (that walk was ~70 s of the
      // round-2 bench at sf0.1; this form is <2 s).
      val packed = tallies.select(
        col("doc_id"),
        (0 until 64)
          .map(j => when(col(s"s$j") * 2 > col("cnt"), lit(1L << j)).otherwise(lit(0L)))
          .reduce((a, b) => a.bitwiseOR(b))
          .as("sim")
      )
      // exploded block rows feed the hot-key counts, the anti-join input,
      // and both self-join sides — materialize once (r19) so the 64-sum
      // tally aggregate upstream runs a single time
      val blockRows = packed.select(
        col("doc_id"),
        col("sim"),
        posexplode(array((0 until 13).map(b =>
          shiftrightunsigned(col("sim"), b * 5).bitwiseAND(lit(31L))): _*))
          .as(Seq("blk_idx", "blk_key"))
      ).localCheckpoint()
      val blocks = SkewTools.dropHotKeys(
        blockRows,
        Seq("blk_idx", "blk_key"),
        BucketCap * 4 // 5-bit blocks: only 32 key values per block index
      )
      val cands = blocks
        .as("x")
        .join(
          blocks.as("y"),
          col("x.blk_idx") === col("y.blk_idx") && col("x.blk_key") === col("y.blk_key") &&
            col("x.doc_id") < col("y.doc_id")
        )
        .filter(bit_count(col("x.sim").bitwiseXOR(col("y.sim"))) <= 12)
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct()
      verified(cands, hashArrays(hr), 0.9)
    }
  )

  /** Oracles: exact all-pairs shingle Jaccard at the query's threshold —
    * feasible in DuckDB at verification SF via the same inverted-index
    * join the exact operator uses. A pass therefore proves the LSH path
    * had zero false negatives on this corpus (its false positives were
    * removed by the verify stage).
    */
  private def exactPairsSql(threshold: String): String =
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(ws)-1),
       |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s
       |  FROM (SELECT doc_id, string_split(text,' ') AS ws FROM documents)
       |), sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS c
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT d1, d2, CAST(c AS DOUBLE)/(s1.n + s2.n - c) AS jaccard
       |FROM pairs JOIN sz s1 ON d1 = s1.doc_id JOIN sz s2 ON d2 = s2.doc_id
       |WHERE CAST(c AS DOUBLE)/(s1.n + s2.n - c) >= $threshold
       |ORDER BY d1, d2""".stripMargin

  // Span dedup ground truth: the same k=8 positional shingles,
  // duplicated-shingle set, covered-position union, and index-filtered
  // reconstruction — computed set-theoretically in DuckDB (ordered
  // string_agg re-join). clean_hash matching proves the engines removed
  // EXACTLY the same token positions from every document. Shared BY
  // REFERENCE with the TVF spelling — one contract, divergence
  // impossible.
  private val spanDedupOracle: String =
    """WITH docs AS (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents),
        |sh AS (
        |  SELECT doc_id, u.pos, array_to_string(list_slice(ts, u.pos + 1, u.pos + 8), ' ') AS shingle
        |  FROM docs, LATERAL (SELECT unnest(range(0, len(ts) - 7)) AS pos) u
        |  WHERE len(ts) >= 8),
        |dup AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(DISTINCT doc_id) >= 2),
        |cov AS (
        |  SELECT DISTINCT s.doc_id, v.p
        |  FROM sh s JOIN dup USING (shingle),
        |    LATERAL (SELECT unnest(range(s.pos, s.pos + 8)) AS p) v),
        |per AS (SELECT doc_id, COUNT(*) AS ndup FROM cov GROUP BY doc_id),
        |toks AS (
        |  SELECT doc_id, u.pos, ts[u.pos + 1] AS tok
        |  FROM docs, LATERAL (SELECT unnest(range(0, len(ts))) AS pos) u),
        |keep AS (
        |  SELECT t.doc_id, t.pos, t.tok FROM toks t
        |  LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.p
        |  WHERE c.doc_id IS NULL),
        |clean AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS ct FROM keep GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(len(d.ts) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(per.ndup, 0) AS BIGINT) AS n_dup_tokens,
        |  md5(COALESCE(clean.ct, '')) AS clean_hash
        |FROM docs d LEFT JOIN per USING (doc_id) LEFT JOIN clean USING (doc_id)
        |ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "dedup_span_exact" -> spanDedupOracle,
    "dedup_span_fp" -> spanDedupOracle,
    "sql_span_dedup" -> spanDedupOracle,
    "dedup_minhash_lsh" -> exactPairsSql("0.6"),
    "sql_minhash_pairs" -> exactPairsSql("0.6"),
    "dedup_simhash" -> exactPairsSql("0.9")
  )
}
