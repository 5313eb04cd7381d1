package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.{DedupClusters, TextOps}

/** Continuous corpus maintenance: the ingest loop a 100 TB training-data
  * pipeline runs as batches of documents land, composing the engine's
  * incremental primitives so NO step ever re-pays a full-corpus pass:
  *
  *  1. exact dedup of the batch against the landed corpus's fingerprint
  *     store (`TextOps.incrementalDedup` — in-batch collapse + anti-join);
  *  2. append survivors to the corpus and their hashes to the store;
  *  3. near-dup candidate pairs from the RESTRICTED (batch × corpus)
  *     inverted-index join (`TextOps.ngramJaccardPairsIncr`);
  *  4. fold those pairs into the persistent cluster map touching only
  *     affected components (`DedupClusters.augment`);
  *  5. downstream consumers (e.g. `TextOps.leakproofSplitSummary`) read
  *     the maintained map — split membership is a pure function of the
  *     cluster rep, so untouched components keep their split forever.
  *
  * State layout under `stateDir` (all plain parquet — readable by any
  * engine, no custom formats):
  *   docs/               corpus rows (doc_id, text, …) — append-only
  *   hashes/             fingerprint store (h) — append-only
  *   cluster_map_v<N>/   versioned cluster maps — blue/green
  *   _CURRENT_MAP        one-line pointer file naming the live version
  *
  * The cluster map is OVERWRITTEN logically but never physically: each
  * ingest writes `cluster_map_v<N+1>` and then flips the pointer —
  * readers of the current version are never raced (the
  * read-what-you-overwrite failure mode a single-dir design hits), and
  * a crash between write and flip leaves the old version live and the
  * orphan version inert. Same blue/green discipline as
  * [[StreamingIvfAppend.compact]].
  *
  * IDEMPOTENCE: replaying a batch (foreachBatch crash-redelivery) is a
  * no-op by construction — every row's hash is already in the store, so
  * exact dedup admits nothing, no pairs are generated, and the map is
  * rewritten unchanged. CorpusMaintenanceSpec pins this and the
  * equivalence of the maintained map with a from-scratch rebuild.
  */
object CorpusMaintenance {

  final case class IngestStats(nBatch: Long, nAdmitted: Long, nNewPairs: Long, mapVersion: Int)

  private def docsPath(stateDir: String) = s"$stateDir/docs"
  private def hashesPath(stateDir: String) = s"$stateDir/hashes"
  private def mapPath(stateDir: String, v: Int) = s"$stateDir/cluster_map_v$v"
  private def pointerPath(stateDir: String) = s"$stateDir/_CURRENT_MAP"

  /** Current live cluster-map version, 0 if none. */
  def currentMapVersion(stateDir: String): Int = {
    val p = java.nio.file.Paths.get(pointerPath(stateDir))
    if (java.nio.file.Files.exists(p)) java.nio.file.Files.readString(p).trim.toInt else 0
  }

  /** The live cluster map (doc_id, rep); empty if no version yet. */
  def currentMap(spark: SparkSession, stateDir: String): DataFrame = {
    val v = currentMapVersion(stateDir)
    if (v == 0)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, rep LONG"))
    else spark.read.parquet(mapPath(stateDir, v))
  }

  /** Bootstrap the state from an initial corpus (runs the one full-graph
    * CC the maintenance loop exists to never run again). */
  def bootstrap(
      spark: SparkSession,
      initial: DataFrame,
      stateDir: String,
      k: Int = 3,
      threshold: Double = 0.5
  ): Unit = {
    initial.write.mode(SaveMode.Overwrite).parquet(docsPath(stateDir))
    initial.select(md5(lower(trim(col("text")))).as("h"))
      .distinct()
      .write.mode(SaveMode.Overwrite).parquet(hashesPath(stateDir))
    val pairs = TextOps.ngramJaccardPairs(initial, k, threshold).select(col("d1"), col("d2"))
    DedupClusters.connectedComponents(pairs)
      .write.mode(SaveMode.Overwrite).parquet(mapPath(stateDir, 1))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(pointerPath(stateDir)), "1")
  }

  /** One ingest step (a pure batch function — call it from foreachBatch
    * or a scheduled job). `batch` must carry `doc_id` and `text`; rows
    * whose normalized text already landed are dropped, survivors join
    * the corpus and the cluster map in one affected-components pass.
    */
  def ingestBatch(
      spark: SparkSession,
      batch: DataFrame,
      stateDir: String,
      k: Int = 3,
      threshold: Double = 0.5
  ): IngestStats = {
    val nBatch = batch.count()
    val store = spark.read.parquet(hashesPath(stateDir))
    // Materialize the admitted set once: it feeds the corpus append, the
    // hash append, and the pair generation.
    val admitted = TextOps.incrementalDedup(batch, store).localCheckpoint()
    val nAdmitted = admitted.count()
    val v = currentMapVersion(stateDir)
    if (nAdmitted == 0) return IngestStats(nBatch, 0, 0, v)

    admitted.drop("__hash")
      .write.mode(SaveMode.Append).parquet(docsPath(stateDir))
    admitted.select(col("__hash").as("h"))
      .write.mode(SaveMode.Append).parquet(hashesPath(stateDir))

    // Restricted (batch × corpus) candidate join over the UPDATED corpus.
    // Batch membership joins onto the index as a flag — never a
    // driver-side id literal, so any batch size is fine.
    val corpus = spark.read.parquet(docsPath(stateDir))
    val newPairs = TextOps
      .ngramJaccardPairsIncrByIds(corpus, admitted.select(col("doc_id")), k, threshold)
      .select(col("d1"), col("d2")).localCheckpoint()
    val nPairs = newPairs.count()

    val next = v + 1
    val merged =
      if (v == 0) DedupClusters.connectedComponents(newPairs)
      else DedupClusters.augment(currentMap(spark, stateDir), newPairs)
    merged.write.mode(SaveMode.Overwrite).parquet(mapPath(stateDir, next))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(pointerPath(stateDir)), next.toString)
    IngestStats(nBatch, nAdmitted, nPairs, next)
  }

  /** Streaming entry: every micro-batch of (doc_id, text, …) runs one
    * [[ingestBatch]] step. foreachBatch gives at-least-once delivery;
    * the hash store makes redelivery a no-op, so end-to-end the state is
    * exactly-once. */
  def sink(
      stream: DataFrame,
      stateDir: String,
      checkpoint: String,
      k: Int = 3,
      threshold: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, _: Long) =>
        ingestBatch(b.sparkSession, b, stateDir, k, threshold); ()
      }
      .start()
}
