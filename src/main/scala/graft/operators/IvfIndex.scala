package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.CosineSimilarity

/** IVF (inverted-file) approximate-nearest-neighbor index: a trained
  * k-means codebook partitions the corpus into clusters; a query probes
  * only the `nProbe` nearest clusters and runs exact cosine inside them.
  *
  * Training is classic sampled Lloyd (the same scheme Spark MLlib KMeans
  * uses): a deterministic hash-sample of the corpus, k deterministic
  * seeds, a few assign→mean iterations. The per-iteration collect is
  * k×dim doubles — O(KB) METADATA, not data (MLlib collects exactly the
  * same thing every iteration); the assignment step itself is a single
  * codegen'd expression over the distributed sample, no join, no shuffle.
  *
  * Determinism (required for the driver's hash gate to cover the recall
  * bound): seeds come from xxhash64 order, distances from the quantized
  * native cosine (order-independent integral-double sums), centroid means
  * are floor-quantized at 1e-6 after each iteration, and all argmin ties
  * break on cluster id — so the trained codebook is a pure function of
  * the data.
  *
  * Scale posture:
  * - assignment = `least()` over k codegen'd cosine structs against
  *   LITERAL centroids — zero shuffle, zero row expansion, stays inside
  *   whole-stage codegen. At 100 TB the assignment runs once at ingest
  *   and the corpus is written partitioned by `cl`, so a probe reads
  *   nProbe partitions instead of the full table.
  * - search broadcasts the (query × nProbe) probe set; the corpus never
  *   shuffles. Per-query top-K via window over the probed subset only.
  */
object IvfIndex {

  /** Trained codebook: centroid i = cluster id i. */
  final case class Model(centroids: Array[Seq[Double]]) {
    def k: Int = centroids.length
  }

  /** Corpus-size-derived IVF parameters — the classical sizing instead
    * of hand-tuned constants: k ≈ √N coarse clusters (cluster size ≈ √N
    * balances the centroid scan k against the probed-cluster scan
    * nProbe·N/k), and nProbe = ceil(targetScanFrac·k) so the EXPECTED
    * SCANNED FRACTION of the corpus stays constant as N grows — recall
    * is governed by that fraction (plus whatever structure k-means
    * finds), so quality is scale-stable by construction.
    *
    * k is capped at 256: the assignment expression embeds k centroid
    * literals in one codegen'd `least()` (zero shuffle — the whole point
    * of the literal design), and the generated source grows linearly in
    * k. Past a few hundred centroids the right shape is a broadcast-join
    * assignment against a centroid table, which trades a per-row join
    * probe for unbounded k; at √N = 256 that switchover sits at N ≈ 65k
    * rows PER TRAINING DOMAIN, and a 100 TB corpus would shard training
    * (per language/source bucket) before reaching it.
    */
  def autoParams(n: Long, targetScanFrac: Double = 0.3): (Int, Int) = {
    val k = math.max(4, math.min(256, math.round(math.sqrt(n.toDouble)).toInt))
    val nProbe = math.max(1, math.min(k, math.ceil(k * targetScanFrac).toInt))
    (k, nProbe)
  }

  /** Quantize to the same 1e-6 lattice the cosine arithmetic uses, so
    * ulp-level nondeterminism in the distributed mean sum can never flip
    * a downstream argmin (the sum's error is ~1e-13, the lattice 1e-6). */
  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Nearest-centroid cluster id for the vector column `v`, as one
    * codegen'd expression (k fused cosine loops + a `least` over structs;
    * CASE-free, shuffle-free). Ties break on the lower cluster id via the
    * struct's second field. */
  def assignExpr(model: Model, v: Column): Column =
    least(model.centroids.zipWithIndex.map { case (c, i) =>
      struct((-CosineSimilarity.column(v, typedLit(c))).as("d"), lit(i).as("cl"))
    }: _*).getField("cl")

  /** Train a k-means codebook on a deterministic hash-sample of `corpus`
    * (expects columns `vec_id`, `v: array<double>`).
    *
    * @param samplePct      percent of rows in the training sample
    *                       (hash-gated, deterministic — not Bernoulli RNG
    *                       sampling)
    * @param maxSampleRows  hard ROW cap on the sample: a percentage alone
    *                       scales with the corpus (40% of 100 TB is 40 TB
    *                       cached on executors); when the pct-sample
    *                       exceeds the cap, the hash threshold is
    *                       tightened rows-proportionally on the SAME hash
    *                       lattice, so the refined sample is a
    *                       deterministic subset of the coarse one and the
    *                       cached/iterated volume is bounded regardless
    *                       of corpus size. Lower samplePct too at real
    *                       scale — the cap is the guarantee, not the tool.
    */
  def train(
      corpus: DataFrame,
      k: Int,
      iters: Int,
      samplePct: Int = 40,
      maxSampleRows: Long = 100000L
  ): Model = {
    val spark = corpus.sparkSession
    graft.functions.GraftExtensions.register(spark)
    import spark.implicits._

    // 1e6-point lattice (not pmod 100) so the row-cap refinement below
    // has resolution to express maxSampleRows/n as a nested threshold
    val lat = 1000000L
    val h = pmod(xxhash64(col("vec_id"), lit(42)), lit(lat))
    val coarseThresh = samplePct * (lat / 100)
    val coarse = corpus.filter(h < lit(coarseThresh)).select(col("vec_id"), col("v"))
    val nCoarse = coarse.count()
    val sample =
      if (nCoarse <= maxSampleRows) coarse
      else {
        val thresh = math.max(1L, coarseThresh * maxSampleRows / nCoarse)
        corpus.filter(h < lit(thresh)).select(col("vec_id"), col("v"))
      }
    sample.cache()
    try {
      // Deterministic seeds: the k sample vectors with the smallest
      // independent hash — a uniform draw without RNG state.
      var cents: Array[Seq[Double]] = sample
        .withColumn("h", xxhash64(col("vec_id"), lit(7)))
        .orderBy(col("h"), col("vec_id"))
        .limit(k)
        .select(col("v"))
        .collect()
        .map(_.getSeq[Double](0).map(q6))

      val vecSum = udaf(
        new graft.functions.VecAgg.VecSum(cents.head.length),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
      )
      for (_ <- 1 to iters) {
        val stats = sample
          .withColumn("cl", assignExpr(Model(cents), col("v")))
          .groupBy(col("cl"))
          .agg(vecSum(col("v")).as("s"), count(lit(1)).as("n"))
          .collect()
        val next = cents.clone() // empty clusters keep their old centroid
        stats.foreach { r =>
          val cl = r.getInt(0)
          val s = r.getSeq[Double](1)
          val n = r.getLong(2).toDouble
          next(cl) = s.map(x => q6(x / n))
        }
        cents = next
      }
      Model(cents)
    } finally sample.unpersist()
  }

  /** Materialize the index: the corpus written PARTITIONED BY cluster id
    * (Hive-style `cl=<k>/` dirs). This is the 100 TB layout the codebook
    * exists for — a probe touches `nProbe` partition directories instead
    * of the full table; everything else (ingest-time assignment cost,
    * file counts bounded by k × tasks) is the standard partitioned-write
    * trade. */
  def writeIndexed(corpus: DataFrame, model: Model, path: String): Unit =
    corpus
      .withColumn("cl", assignExpr(model, col("v")))
      .write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("cl")
      .parquet(path)

  /** Search a materialized index: the probed cluster ids (a metadata-
    * scale driver-side set, like the centroids themselves) become an
    * `IN` filter on the partition column, so the scan PRUNES to nProbe
    * directories at planning time — visible as PartitionFilters in
    * explain, and the property IvfIndexLayoutSpec pins. Returns
    * (q_id, rnk, vec_id, cos), identical to [[search]] on the same
    * corpus+model. */
  def searchIndexed(
      indexPath: String,
      probes: DataFrame,
      model: Model,
      nProbe: Int,
      topK: Int
  ): DataFrame = {
    val spark = probes.sparkSession
    graft.functions.GraftExtensions.register(spark)
    import spark.implicits._

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

    // Q × nProbe cluster ids — metadata-scale, safe to collect for the
    // planning-time partition filter (same class of driver-side state as
    // the k×dim codebook).
    val probedClusters = probed.select(col("cl")).distinct().as[Int].collect().toSeq

    val assigned = spark.read
      .parquet(indexPath)
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

  /** Exact top-K cosine search restricted to the `nProbe` clusters whose
    * centroids are nearest each query. `corpus` = (vec_id, v),
    * `probes` = (q_id, qv). Returns (q_id, rnk, vec_id, cos). */
  def search(
      corpus: DataFrame,
      probes: DataFrame,
      model: Model,
      nProbe: Int,
      topK: Int
  ): DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.GraftExtensions.register(spark)
    import spark.implicits._

    val centDf = model.centroids.zipWithIndex
      .map { case (c, i) => (i, c) }
      .toSeq
      .toDF("cl", "cv")
    // Q × k rows — driver-scale; nearest nProbe centroids per query.
    val wq = Window.partitionBy(col("q_id")).orderBy(col("d").asc, col("cl").asc)
    val probed = probes
      .crossJoin(broadcast(centDf))
      .withColumn("d", -CosineSimilarity.column(col("qv"), col("cv")))
      .withColumn("crn", row_number().over(wq))
      .filter(col("crn") <= nProbe)
      .select(col("q_id"), col("qv"), col("cl"))

    val assigned = corpus.withColumn("cl", assignExpr(model, col("v")))
    val wr = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
    assigned
      .join(broadcast(probed), Seq("cl"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", CosineSimilarity.column(col("qv"), col("v")))
      .withColumn("rnk", row_number().over(wr).cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cos"))
  }
}
