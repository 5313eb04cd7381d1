package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GraftSession, Tables}
import graft.operators.{IvfIndex, IvfPq}

/** Measures APPEND DRIFT of the maintained PQ code index (r17, the
  * r16 feature's missing cost curve): `searchIndexedPqWithDelta` serves
  * base + delta codes, but the delta is encoded with the FROZEN
  * codebooks (coarse centroids + per-cluster residual books trained on
  * the base corpus). How far can the appended fraction grow before the
  * frozen books stop describing the data — i.e. when is RETRAIN due?
  *
  * Two regimes, both measured (recall@5 vs brute force over the full
  * base∪delta corpus, the gated config m=8/64 codes/shortlist 50):
  *  - STATIONARY appends (the odd half of the same fixture): the honest
  *    negative — recall should hold at every fraction, because codebook
  *    quality depends on the data DISTRIBUTION, not the data volume.
  *  - SHIFTED appends (every component +shift): distribution drift —
  *    recall on shifted probes decays as the frozen books mis-encode
  *    the new region, and a RETRAIN on base∪delta recovers it. The
  *    fraction where recall crosses the gate bound (0.60) is the
  *    retrain threshold the maintenance loop should watch.
  *
  *   PQDRIFT kind=<stationary|shifted|retrained> frac=<f> recall@5=<r>
  *
  * Drive: Test/runMain graft.tools.PqDriftProbe [sfDir] (default sf0.1).
  */
object PqDriftProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    val e = Tables
      .embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      .localCheckpoint()
    val base = e.filter(pmod(col("vec_id"), lit(2)) === 0).localCheckpoint()
    val appendsAll = e.filter(pmod(col("vec_id"), lit(2)) === 1)
    val nBase = base.count()
    val (k, nProbe) = IvfIndex.autoParams(nBase, targetScanFrac = 0.45)
    val coarse = IvfIndex.train(base, k = k, iters = 3)
    val assigned = IvfIndex.assignAuto(base, coarse)
    val pq = IvfPq.train(assigned, coarse, m = 8, nCodes = 64)
    val basePath = Files.createTempDirectory("pqdrift_base").toString
    IvfPq.writeIndexedPq(assigned, pq, basePath)

    def recallAt5(corpus: org.apache.spark.sql.DataFrame,
                  probes: org.apache.spark.sql.DataFrame,
                  ann: org.apache.spark.sql.DataFrame): Double = {
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
      val bf = corpus
        .join(broadcast(probes), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          graft.functions.CosineSimilarity.column(col("qv"), col("v")).as("cos"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("vec_id"))
      val q = probes.count()
      ann.join(bf, Seq("q_id", "vec_id")).count().toDouble / (5.0 * q)
    }

    for (shift <- Seq(0.0, 1.5); frac <- Seq(0.1, 0.25, 0.5, 1.0)) {
      val nApp = (nBase * frac).toLong
      val app = appendsAll
        .filter(col("vec_id") < 2L * nApp)
        .select(col("vec_id"), transform(col("v"), x => x + lit(shift)).as("v"))
        .localCheckpoint()
      val corpus = base.unionByName(app).localCheckpoint()
      // FROZEN books encode the delta — the production append path's
      // layout (cl-partitioned codes WITH the per-row acd drift
      // statistic appendEncodedSink persists)
      val deltaPath = Files.createTempDirectory(s"pqdrift_d_${shift}_$frac").toString
      IvfPq.encode(IvfIndex.assignAuto(app, coarse), pq, withAcd = true)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("cl").parquet(deltaPath)
      // probe where the drift hurts: shifted probes query the NEW region
      val probes = (if (shift == 0.0) base else app)
        .orderBy(col("vec_id")).limit(5)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
        .localCheckpoint()
      val ann = IvfPq.searchIndexedPqWithDelta(
        basePath, deltaPath, corpus, probes, pq, nProbe, topK = 5, shortlist = 50)
      val kind = if (shift == 0.0) "stationary" else "shifted"
      // the ENGINE statistic next to the recall it predicts (r18):
      // driftReport's acd ratio over the same delta the search served
      val drift = IvfPq.driftReport(spark, basePath, deltaPath)
      println(f"PQDRIFT kind=$kind frac=$frac recall@5=${recallAt5(corpus, probes, ann)}%.3f " +
        f"acdRatio=${drift.ratio}%.3f deltaMeanAcd=${drift.deltaMeanAcd}%.4f " +
        f"baseMeanAcd=${drift.baseMeanAcd}%.4f")

      // the recovery row: retrain coarse + books on base∪delta at the
      // worst point, same probes — what the retrain threshold buys back
      if (shift != 0.0 && frac == 1.0) {
        val coarse2 = IvfIndex.train(corpus, k = k, iters = 3)
        val assigned2 = IvfIndex.assignAuto(corpus, coarse2)
        val pq2 = IvfPq.train(assigned2, coarse2, m = 8, nCodes = 64)
        val (_, nProbe2) = IvfIndex.autoParams(corpus.count(), targetScanFrac = 0.45)
        val ann2 = IvfPq.searchPq(
          corpus, IvfPq.encode(assigned2, pq2), probes, pq2, nProbe2,
          topK = 5, shortlist = 50)
        println(f"PQDRIFT kind=retrained frac=$frac " +
          f"recall@5=${recallAt5(corpus, probes, ann2)}%.3f")
      }
    }
    spark.stop()
  }
}
