package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Chunked-renormalization quantized EWMA — the hot-key-parallel form of
  * the per-key exponential moving average (α = 1/8, integer cent grid).
  *
  * Why not the textbook per-event recurrence s ← s + (x − s) div 8?
  * Because its per-step truncating division makes the per-key fold
  * IRREDUCIBLY sequential: the k-step transition is a nest of k floors,
  * which is not affine in the incoming state, so chunk transitions
  * cannot be composed in a parallel prefix — and the recurrence does
  * not even forget its state (trunc-toward-zero has a dead zone: two
  * states 3 apart under a constant input stream stay 3 apart forever),
  * so no warm-up window can cut the dependence either. A single hot
  * key's multi-billion-row history would serialize onto one core — the
  * round-4 scale flag.
  *
  * The fix changes the OPERATOR's defining algebra (and its oracle, in
  * lockstep) rather than chasing an impossible bit-exact parallelization:
  * truncate once per CHUNK of C = 32 events instead of once per event.
  * Within a chunk the EWMA recursion is carried EXACTLY — s_out =
  * ⌊(7^L·s_in + Σ_{j=1..L} 7^(L−j)·8^(j−1)·x_j) / 8^L⌋ for a chunk of
  * length L — which is the true rational EWMA of the chunk, floored
  * once. This is numerically CLOSER to the real EWMA than per-event
  * truncation (one rounding per 32 events instead of 32), and it makes
  * the plan scale:
  *
  *  - the heavy per-event work (weighted chunk sums B) is a groupBy on
  *    (key, chunk_idx) — a hot key's chunks hash across ALL tasks;
  *  - per-key positions come from [[DistributedRank.withPerKeyRank]]
  *    (two-pass, no one-task-per-key window);
  *  - the only sequential piece left is the per-key fold over CHUNK
  *    SUMMARIES: O(1) work and O(1) state per C events — depth n/32,
  *    not n, and each step is 4 small-BigInt ops on a 4-field row.
  *
  * All arithmetic is exact BigInt; values are non-negative (cent grid),
  * so BigInt `/`, Spark `div` and DuckDB `//` agree (floor = trunc).
  * The DuckDB oracle mirrors the construction literally — HUGEINT
  * weight lookup tables generated from the SAME BigInt constants, chunk
  * sums, and a chunk-level recursive CTE (fits HUGEINT because C = 32
  * keeps every term below ~1e34) — so the hash-compare re-proves the
  * algebra end to end at every scale factor.
  *
  * EwmaSpec additionally pins (a) equivalence with an in-memory
  * single-threaded reference of the same algebra, and (b) >1 task
  * participating in the chunk-sum stage for a planted hot key.
  */
object Ewma {
  /** Chunk length C. Bounded by the ORACLE's arithmetic, not ours:
    * DuckDB HUGEINT is 128-bit, and the largest chunk-sum term is
    * 8^(C−1)·x ≈ 1e28·x — at C = 32 a corpus with per-event values up
    * to ~10^8 cents stays under 10^37 < HUGEINT max. (Scala-side BigInt
    * has no such bound.) */
  val ChunkLen = 32

  private[graft] val pow7: Array[BigInt] =
    Array.iterate(BigInt(1), ChunkLen + 1)(_ * 7)
  private[graft] val pow8: Array[BigInt] =
    Array.iterate(BigInt(1), ChunkLen + 1)(_ * 8)

  /** weight(j) = 7^(C−j)·8^(j−1): position j's exact contribution to a
    * FULL chunk's numerator; a partial chunk of length L divides the
    * sum by 7^(C−L) (exactly — every term with j ≤ L carries at least
    * that power of 7). */
  private[operators] val weight: Array[BigInt] =
    Array.tabulate(ChunkLen + 1)(j => if (j == 0) BigInt(0) else pow7(ChunkLen - j) * pow8(j - 1))

  /** Chunk summaries (key, ci, L, B-as-decimal-string): ci = −1 rows
    * are per-key seeds carrying the first event's value (the fold's
    * initial state, matching the recurrence's s_1 = x_1); ci ≥ 0 rows
    * carry chunk length L and the exact numerator B for the chunk
    * transition. Partitioned by (key, ci) — the hot-key-parallel stage.
    */
  def chunkSummaries(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      xCol: String
  ): Dataset[(Long, Long, Int, String)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranked = DistributedRank.withPerKeyRank(
      df.select(col(keyCol), col(tsCol), col(idCol), col(xCol)),
      keyCol,
      Seq(col(keyCol), col(tsCol), col(idCol)),
      rankCol = "__pos")
    // Seeds ride the SAME grouped pass as chunks (ci = −1, j = 0): a
    // separate filter+union branch would re-execute every stage above
    // the rank subplan's pinned RDD a second time — measured ~2× the
    // whole operator's fixed cost at bench scale for zero semantic gain.
    ranked
      .select(
        col(keyCol).cast("long"),
        expr(s"CAST(CASE WHEN __pos = 1 THEN -1 ELSE (__pos - 2) div $ChunkLen END AS BIGINT)"),
        expr(s"CAST(CASE WHEN __pos = 1 THEN 0 ELSE (__pos - 2) % $ChunkLen + 1 END AS INT)"),
        col(xCol).cast("long"))
      .as[(Long, Long, Int, Long)]
      .groupByKey(t => (t._1, t._2))
      .mapGroups { (key: (Long, Long), it: Iterator[(Long, Long, Int, Long)]) =>
        if (key._2 == -1L) {
          (key._1, -1L, 0, it.next()._4.toString) // the per-key seed row
        } else {
          // ≤ ChunkLen rows per group by construction — bounded memory.
          val rows = it.toArray.sortBy(_._3)
          val praw = rows.foldLeft(BigInt(0))((acc, r) => acc + BigInt(r._4) * weight(r._3))
          (key._1, key._2, rows.length, (praw / pow7(ChunkLen - rows.length)).toString)
        }
      }
  }

  /** (key, n_events, ewma_q) per key: seed + fold over chunk summaries.
    * The fold partition-sorts by (key, ci) and streams with O(1) state —
    * a billion-event key costs its task n/32 four-field rows, each a
    * handful of small-BigInt ops, while the O(n) weighted-sum work
    * happened in the hash-parallel stage above. */
  def ewmaByKey(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      xCol: String
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    chunkSummaries(df, keyCol, tsCol, idCol, xCol)
      .repartition(col("_1"))
      .sortWithinPartitions(col("_1"), col("_2"))
      .mapPartitions { it =>
        val b = it.buffered
        new Iterator[(Long, Long, Long)] {
          def hasNext: Boolean = b.hasNext
          def next(): (Long, Long, Long) = {
            val (k, ci0, _, seed) = b.next()
            require(ci0 == -1L, s"missing seed row for key $k (got chunk $ci0 first)")
            var s = BigInt(seed)
            var n = 1L
            while (b.hasNext && b.head._1 == k) {
              val (_, _, l, bs) = b.next()
              s = (pow7(l) * s + BigInt(bs)) / pow8(l)
              n += l
            }
            (k, n, s.toLong)
          }
        }
      }
      .toDF(keyCol, "n_events", "ewma_q")
  }

  /** The DuckDB oracle, generated from the SAME BigInt constants so the
    * two engines cannot drift: HUGEINT weight/power lookup tables, the
    * identical chunk sums, and a chunk-level recursive CTE for the fold.
    */
  def oracleSql(table: String, keyCol: String, tsCol: String, idCol: String, xExpr: String): String = {
    val wts = (1 to ChunkLen).map(j => s"($j, CAST('${weight(j)}' AS HUGEINT))").mkString(", ")
    val p7s = (0 to ChunkLen).map(d => s"($d, CAST('${pow7(d)}' AS HUGEINT))").mkString(", ")
    val p8s = (1 to ChunkLen).map(d => s"($d, CAST('${pow8(d)}' AS HUGEINT))").mkString(", ")
    s"""WITH RECURSIVE
       |e AS (SELECT $keyCol AS k, CAST($xExpr AS BIGINT) AS x,
       |        ROW_NUMBER() OVER (PARTITION BY $keyCol ORDER BY $tsCol, $idCol) AS pos,
       |        COUNT(*) OVER (PARTITION BY $keyCol) AS n
       |      FROM $table),
       |w(j, wt) AS (VALUES $wts),
       |p7(d, p) AS (VALUES $p7s),
       |p8(d, p) AS (VALUES $p8s),
       |seed AS (SELECT k, x, n FROM e WHERE pos = 1),
       |t AS (SELECT k, (pos - 2) // $ChunkLen AS ci, ((pos - 2) % $ChunkLen) + 1 AS j, x
       |      FROM e WHERE pos >= 2),
       |c AS (SELECT t.k, t.ci, COUNT(*) AS len, SUM(CAST(t.x AS HUGEINT) * w.wt) AS praw
       |      FROM t JOIN w ON w.j = t.j GROUP BY 1, 2),
       |c2 AS (SELECT c.k, c.ci, c.len, c.praw // p7.p AS b
       |       FROM c JOIN p7 ON p7.d = $ChunkLen - c.len),
       |r(k, ci, s) AS (
       |  SELECT k, CAST(-1 AS BIGINT), CAST(x AS HUGEINT) FROM seed
       |  UNION ALL
       |  SELECT r.k, c2.ci, (p7.p * r.s + c2.b) // p8.p
       |  FROM r JOIN c2 ON c2.k = r.k AND c2.ci = r.ci + 1
       |    JOIN p7 ON p7.d = c2.len JOIN p8 ON p8.d = c2.len),
       |last AS (SELECT k, MAX(ci) AS mci FROM r GROUP BY 1)
       |SELECT r.k AS $keyCol, seed.n AS n_events, CAST(r.s AS BIGINT) AS ewma_q
       |FROM r JOIN last ON last.k = r.k AND last.mci = r.ci
       |JOIN seed ON seed.k = r.k
       |ORDER BY r.k""".stripMargin
  }
}
