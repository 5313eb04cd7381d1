package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.IvfIndex

/** Streaming maintenance for a materialized IVF index: new embeddings
  * append continuously without retraining or rewriting the base.
  *
  * Layout: the batch-built base index (IvfIndex.writeIndexed — corpus
  * partitioned by cluster id) stays immutable; each appended micro-batch
  * is assigned to its nearest EXISTING centroid with the same codegen'd
  * expression used at build time and lands in a cluster-partitioned
  * DELTA directory via the manifest-committed file sink — so appends
  * inherit the exactly-once contract (offsets WAL + `_spark_metadata`
  * commit, OrcStreamingSinkSpec) and a crash mid-batch can neither lose
  * nor duplicate vectors.
  *
  * Search unions base + delta scans; both prune to the probed cluster
  * partitions at planning time, so the probe cost stays nProbe/k of
  * (base + delta), never a full scan. The codebook is FROZEN between
  * retrains — standard IVF practice (FAISS's add-after-train works the
  * same way): assignment quality for appended vectors matches build-time
  * assignment exactly because it IS the build-time expression. When
  * drift accumulates, [[compact]] folds the delta into a retrained base
  * offline; the streaming side never blocks on it.
  *
  * Scale posture: assignment is shuffle-free whole-stage codegen on the
  * stream; file counts are (k × tasks) per batch — compacted by the
  * manifest every 10 batches and physically by [[compact]]; search-side
  * partition pruning holds because BOTH dirs are `cl=<k>/` Hive layouts.
  */
object StreamingIvfAppend {

  /** Append a stream of (vec_id, v) to the delta of a frozen-codebook
    * index. Assignment uses the fused-literal expression (streaming-safe:
    * pure codegen, no mapPartitions re-encode), so the model must have
    * k ≤ [[IvfIndex.LiteralAssignMaxK]] — exactly the auto-sized regime.
    */
  def appendSink(
      stream: DataFrame,
      model: IvfIndex.Model,
      deltaPath: String,
      checkpoint: String,
      vCol: String = "v",
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    require(model.k <= IvfIndex.LiteralAssignMaxK,
      s"streaming append uses the codegen assignment path; k=${model.k} exceeds ${IvfIndex.LiteralAssignMaxK}")
    stream
      .withColumn("cl", IvfIndex.assignExpr(model, col(vCol)))
      .writeStream
      .format("parquet")
      .outputMode("append")
      .option("path", deltaPath)
      .option("checkpointLocation", checkpoint)
      .partitionBy("cl")
      .trigger(trigger)
      .start()
  }

  /** Exact top-K cosine over base ∪ delta, probing the `nProbe` nearest
    * clusters — IvfIndex.searchIndexed generalized to a maintained
    * index. The delta read resolves through its `_spark_metadata`
    * manifest, so only COMMITTED appends are searchable (a mid-flight
    * batch is invisible until its commit). Returns (q_id, rnk, vec_id,
    * cos), identical to searchIndexed on a base holding the union.
    */
  def searchWithDelta(
      basePath: String,
      deltaPath: String,
      probes: DataFrame,
      model: IvfIndex.Model,
      nProbe: Int,
      topK: Int
  ): DataFrame = {
    val spark = probes.sparkSession
    graft.functions.GraftExtensions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import graft.functions.CosineSimilarity

    val centDf = model.centroids.zipWithIndex
      .map { case (c, i) => (i, c) }
      .toSeq
      .toDF("cl", "cv")
    val wq = Window.partitionBy(col("q_id")).orderBy(col("d").asc, col("cl").asc)
    val probed = probes
      .crossJoin(broadcast(centDf))
      .withColumn("d", -CosineSimilarity.column(col("qv"), col("cv")))
      .withColumn("crn", row_number().over(wq))
      .filter(col("crn") <= nProbe)
      .select(col("q_id"), col("qv"), col("cl"))

    // Metadata-scale (Q × nProbe cluster ids) planning-time partition
    // filter — prunes BOTH directory scans to nProbe partitions.
    val probedClusters = probed.select(col("cl")).distinct().as[Int].collect().toSeq

    val base = spark.read.parquet(basePath)
    // Schema pinned from the base so an empty-but-initialized delta
    // (manifest present, zero committed files) still unions cleanly.
    val delta = spark.read.schema(base.schema).parquet(deltaPath)
    val assigned = base.unionByName(delta)
      .filter(col("cl").isin(probedClusters: _*))

    val wr = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    assigned
      .join(broadcast(probed), Seq("cl"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", CosineSimilarity.column(col("qv"), col("v")))
      .withColumn("rnk", row_number().over(wr).cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cos"))
  }

  /** Offline fold: retrain on base ∪ delta and rewrite a fresh base
    * index (new codebook, new layout). The streaming append keeps
    * running against the OLD model/delta until the caller switches the
    * sink over to a new delta dir + checkpoint — the usual blue/green
    * index swap. Returns the new model.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      basePath: String,
      deltaPath: String,
      newBasePath: String,
      k: Int,
      iters: Int = 3
  ): IvfIndex.Model = {
    val base = spark.read.parquet(basePath)
    val delta = spark.read.schema(base.schema).parquet(deltaPath)
    val corpus = base.unionByName(delta).select(col("vec_id"), col("v"))
    val model = IvfIndex.train(corpus, k = k, iters = iters)
    IvfIndex.writeIndexed(corpus, model, newBasePath)
    model
  }
}
