package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GraftSession, Tables}
import graft.operators.IvfIndex

/** Diagnostic CLI: measured mean recall@5 of the IVF index vs exact
  * brute force, per SF dir — the evidence behind sim_ann_ivf's declared
  * ≥ 0.70 bound (measured 0.92/0.88/0.96 at the gate's frac=0.45 +
  * spillMargin=0.1 config, the IVFGRID rows) and sim_ann_lsh's ≥ 0.64.
  * Run: `runMain graft.tools.RecallProbe <sfDir>...` */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    graft.functions.GraftExtensions.register(spark)
    for (dir <- args) {
      val e = Tables
        .embeddings(spark, dir)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      val n = e.count()
      val (k, nProbe) = IvfIndex.autoParams(n)
      val t0 = System.nanoTime()
      val model = IvfIndex.train(e, k = k, iters = 3)
      println(s"PARAMS $dir: n=$n k=$k nProbe=$nProbe train=${(System.nanoTime() - t0) / 1e9}s")
      val probes = e.filter(col("vec_id") < 5).select(col("vec_id").as("q_id"), col("v").as("qv"))
      val ann = IvfIndex.search(e, probes, model, nProbe = nProbe, topK = 5)
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
      val bf = e
        .join(broadcast(probes), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          graft.functions.CosineSimilarity.column(col("qv"), col("v")).as("cos"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("vec_id"))
      val hits = ann.join(bf, Seq("q_id", "vec_id")).count()
      val q = probes.count()
      println(s"RECALL $dir: mean recall@5 = ${hits.toDouble / (5.0 * q)} ($hits/${5 * q} hits)")

      // IVF recall levers on the SAME trained model: spilled corpus
      // multi-assignment (margin-controlled boundary replication — query
      // cost unchanged, storage × (1 + spill frac)) vs simply probing
      // more clusters (query cost × frac/0.3). Rows = the spilled index
      // size; recall per (scanFrac, margin).
      for ((frac, margin) <- Seq(
          (0.3, 0.0), (0.3, 0.05), (0.3, 0.1), (0.3, 0.2),
          (0.45, 0.0), (0.45, 0.1), (0.6, 0.0))) {
        val np = math.max(1, math.min(k, math.ceil(k * frac).toInt))
        val annX =
          if (margin > 0) IvfIndex.searchSpilled(e, probes, model, np, 5, margin)
          else IvfIndex.search(e, probes, model, np, 5)
        val hitsX = annX.join(bf, Seq("q_id", "vec_id")).count()
        val idxRows =
          if (margin > 0) IvfIndex.assignSpilled(e, model, margin).count() else n
        println(f"IVFGRID $dir frac=$frac margin=$margin nProbe=$np " +
          f"recall@5=${hitsX.toDouble / (5.0 * q)}%.3f indexRows=$idxRows " +
          f"(x${idxRows.toDouble / n}%.2f)")
      }

      // SQ8 (int8-quantized corpus) top-K recall vs the same brute force
      val deq = graft.operators.Quantize
        .withQuantized(e, "v")
        .select(col("vec_id"),
          graft.operators.Quantize.dequantize(col("q"), col("q_scale")).as("v"))
      val q8 = graft.operators.Similarity.cosineTopK(deq, probes, 5)
      val hitsQ8 = q8.join(bf, Seq("q_id", "vec_id")).count()
      println(s"SQ8 $dir: mean recall@5 = ${hitsQ8.toDouble / (5.0 * q)} ($hitsQ8/${5 * q} hits)")

      // LSH-bucketed ANN recall vs the same brute force, per band params;
      // t = extra multi-probe buckets per band (0 = single-probe). One
      // unbounded search per config serves both measures: the top-5 is
      // its rnk <= 5 prefix, the candidate count its cardinality.
      for ((r, b, t) <- Seq(
          (4, 8, 0), (5, 8, 0), (6, 8, 0), (6, 16, 0), (8, 16, 0), (8, 32, 0),
          (6, 16, 1), (6, 16, 2), (6, 16, 3), (8, 32, 2))) {
        val all2 = graft.operators.Similarity
          .lshSearch(e, probes, r, b, topK = Int.MaxValue, extraProbes = t)
          .localCheckpoint()
        val hits2 = all2.filter(col("rnk") <= 5).join(bf, Seq("q_id", "vec_id")).count()
        val cands = all2.count()
        println(f"LSHANN $dir r=$r b=$b t=$t mean recall@5 = ${hits2.toDouble / (5.0 * q)} " +
          f"candidates/probe = ${cands.toDouble / math.max(q, 1)}%.1f")
      }

      // LSH near-dup false negatives vs exact all-pairs at 0.4 (must be 0)
      val lsh = graft.operators.Similarity
        .embedNearDupLsh(e, threshold = 0.4, bitsPerBand = 4, bands = 64)
        .select(col("v1"), col("v2"))
      val exact = e
        .as("a")
        .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
          graft.functions.CosineSimilarity.column(col("a.v"), col("b.v")).as("cos"))
        .filter(col("cos") >= 0.4)
        .select(col("v1"), col("v2"))
      val fn = exact.exceptAll(lsh).count()
      val nc = graft.operators.Similarity.lshCandidates(e, 4, 64).count()
      println(s"LSH $dir: pairs=${exact.count()} FN=$fn candidates=$nc")
    }
    spark.stop()
  }
}
