package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-sequence construction: the two layout operators an LLM data
  * pipeline runs AFTER filtering/dedup and BEFORE shard writing.
  *
  * The reference stops at "land typed rows in columnar files"
  * (RowOrcBucketingSink.java:26-342); these operators are the
  * brief-mandated extension for the 100 TB training-data use case.
  *
  * - `pack_chunks` — concatenate-and-chunk packing: documents are laid
  *   end-to-end in one deterministic global order and the token stream is
  *   cut every `ctx` tokens (docs may span cut points — the standard
  *   "packed" pretraining layout). The only global state is a running
  *   token offset, computed with [[DistributedRank.withGlobalCumSum]]'s
  *   two-pass plan: range-partition by doc_id, local cumulative windows,
  *   one metadata-scale offset window. No single-partition data movement
  *   — the op scales exactly as far as a distributed sort does.
  * - `chunk_docs` — within-doc sliding-window chunking (size 64 tokens,
  *   stride 48): long docs become overlapping chunks, each identified by
  *   an md5 of its joined text. Pure per-row explode — linear, no
  *   shuffle until the final order. Chunk starts advance by stride while
  *   start < n_tokens, so every token lands in ≥1 chunk and no chunk is
  *   empty.
  */
object Chunking {
  type Q = (SparkSession, String) => DataFrame

  /** Tokens per training sequence for pack_chunks (GPT-2-ish context). */
  private val Ctx = 2048

  /** chunk_docs window geometry: 64-token chunks every 48 tokens. */
  private val ChunkLen = 64
  private val Stride   = 48

  /** Packed-sequence layout for `d` = (doc_id, text): per doc, its
    * half-open token span [start_off, start_off + n_tokens) in the
    * doc_id-ordered concatenated token stream, and the ctx-sized chunk
    * ids that span touches. Integer-exact end to end; the global offset
    * rides [[DistributedRank.withGlobalCumSum]]'s two-pass plan. Also
    * the engine of the `graft_pack_chunks` SQL table function. */
  def packChunks(d: DataFrame, ctx: Int): DataFrame =
    packChunksCounted(
      d.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens")),
      ctx)

  /** The same packed layout over PRE-COUNTED tokens (doc_id, n_tokens) —
    * the seam the BPE twin (`pack_chunks_bpe`) plugs real token counts
    * into; the whitespace spelling above is this with a trivial count. */
  def packChunksCounted(docs: DataFrame, ctx: Int): DataFrame = {
    DistributedRank
      .withGlobalCumSum(docs, "n_tokens", Seq(col("doc_id")), cumCol = "cum")
      .select(
        col("doc_id"),
        col("n_tokens"),
        (col("cum") - col("n_tokens")).as("start_off"),
        // `div` (integer), not `/` (double) — offsets near 2^53 would
        // round; chunk ids must stay exact at any stream length.
        expr(s"(cum - n_tokens) div $ctx").as("chunk_first"),
        expr(s"(cum - 1) div $ctx").as("chunk_last")
      )
      .withColumn("n_chunks_spanned", col("chunk_last") - col("chunk_first") + 1)
  }

  val queries: Map[String, Q] = Map(
    "pack_chunks" -> { (spark, dir) =>
      packChunks(Tables.documents(spark, dir), Ctx).orderBy(col("doc_id"))
    },

    // The SQL spelling: graft_pack_chunks resolves the table name and
    // reaches the same two-pass distributed-cumsum plan — a spark.sql
    // user lays out training sequences without Scala. Shares
    // pack_chunks' oracle BY REFERENCE.
    "sql_pack_chunks" -> { (spark, dir) =>
      graft.functions.GraftExtensions.register(spark)
      Tables.documents(spark, dir).createOrReplaceTempView("graft_docs_pack")
      spark.sql(
        s"""SELECT doc_id, n_tokens, start_off, chunk_first, chunk_last, n_chunks_spanned
           |FROM graft_pack_chunks('graft_docs_pack', 'doc_id', 'text', $Ctx)
           |ORDER BY doc_id""".stripMargin)
    },

    // SEQUENCE-LENGTH BUCKETED BATCHING — the other half of training
    // batch layout next to packing: group documents into length buckets
    // (32-token bands) so each training batch pads to a similar length
    // (padding waste ∝ in-batch length spread), then number fixed-size
    // batches WITHIN each bucket by a deterministic doc order. Per
    // batch: size, token sum, and the padded-token cost at the batch's
    // max length — the quantity this layout exists to minimize. Shape:
    // one bucket-partitioned window (never global) + one hash agg; at
    // 100 TB the bucket key is the shuffle key and batches stay local.
    "batch_by_length" -> { (spark, dir) =>
      val docs = Tables
        .documents(spark, dir)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .withColumn("bucket", expr("n_tokens div 32"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("bucket")).orderBy(col("doc_id"))
      docs
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("batch_id", expr("(rn - 1) div 8"))
        .groupBy(col("bucket"), col("batch_id"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          max(col("n_tokens")).as("max_tokens"),
          (count(lit(1)) * max(col("n_tokens")) - sum(col("n_tokens"))).as("pad_tokens"))
        .orderBy(col("bucket"), col("batch_id"))
    },

    // Sliding-window chunks with overlap; md5 of the chunk text makes
    // the cut positions (not just the counts) hash-checkable.
    "chunk_docs" -> { (spark, dir) =>
      Tables
        .documents(spark, dir)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .withColumn("n", size(col("ws")))
        .select(
          col("doc_id"),
          col("ws"),
          col("n"),
          posexplode(sequence(lit(0), col("n") - 1, lit(Stride)))
            .as(Seq("chunk_idx", "start"))
        )
        .select(
          col("doc_id"),
          col("chunk_idx").cast("long").as("chunk_idx"),
          least(lit(ChunkLen), col("n") - col("start")).cast("long").as("chunk_tokens"),
          md5(concat_ws(" ", slice(col("ws"), col("start") + 1, lit(ChunkLen)))).as("chunk_hash")
        )
        .orderBy(col("doc_id"), col("chunk_idx"))
    }
  )

  val oracles: Map[String, String] = Map(
    "batch_by_length" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, n_tokens, n_tokens // 32 AS bucket,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY n_tokens // 32 ORDER BY doc_id) AS BIGINT) AS rn
        |  FROM d)
        |SELECT bucket, (rn - 1) // 8 AS batch_id, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
        |  MAX(n_tokens) AS max_tokens,
        |  CAST(COUNT(*) * MAX(n_tokens) - SUM(n_tokens) AS BIGINT) AS pad_tokens
        |FROM b GROUP BY bucket, (rn - 1) // 8
        |ORDER BY bucket, batch_id""".stripMargin,
    "pack_chunks" ->
      s"""WITH t AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
         |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM documents)
         |SELECT doc_id, n_tokens, CAST(cum - n_tokens AS BIGINT) AS start_off,
         |  CAST((cum - n_tokens) // $Ctx AS BIGINT) AS chunk_first,
         |  CAST((cum - 1) // $Ctx AS BIGINT) AS chunk_last,
         |  CAST((cum - 1) // $Ctx - (cum - n_tokens) // $Ctx + 1 AS BIGINT) AS n_chunks_spanned
         |FROM t ORDER BY doc_id""".stripMargin,
    // sql_pack_chunks shares pack_chunks' oracle BY REFERENCE (same
    // column names, same ordering — only the spelling differs).
    "sql_pack_chunks" ->
      s"""WITH t AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
         |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM documents)
         |SELECT doc_id, n_tokens, CAST(cum - n_tokens AS BIGINT) AS start_off,
         |  CAST((cum - n_tokens) // $Ctx AS BIGINT) AS chunk_first,
         |  CAST((cum - 1) // $Ctx AS BIGINT) AS chunk_last,
         |  CAST((cum - 1) // $Ctx - (cum - n_tokens) // $Ctx + 1 AS BIGINT) AS n_chunks_spanned
         |FROM t ORDER BY doc_id""".stripMargin,
    "chunk_docs" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws, len(string_split(text, ' ')) AS n
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, ws, n, unnest(range(0, n, $Stride)) AS start
         |  FROM t)
         |SELECT doc_id, CAST(start // $Stride AS BIGINT) AS chunk_idx,
         |  CAST(least($ChunkLen, n - start) AS BIGINT) AS chunk_tokens,
         |  md5(array_to_string(list_slice(ws, start + 1, start + $ChunkLen), ' ')) AS chunk_hash
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
  )
}
