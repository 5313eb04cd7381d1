package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GraftSession, Tables}
import graft.operators.{IvfIndex, IvfPq, Quantize}

/** IVF-PQ measurement probe: recall@5 vs brute force per (m, nCodes,
  * shortlist), and the bytes-per-vector table (raw float64 / stored
  * float32 / SQ8 / PQ codes) — the SCALING.md evidence for the
  * sim_ann_ivfpq gate's pinned bound and the compression claim. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftExtensions.register(spark)
    for (dir <- args) {
      val e = Tables
        .embeddings(spark, dir)
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
        .localCheckpoint()
      val n = e.count()
      val (k, nProbe) = IvfIndex.autoParams(n, targetScanFrac = 0.45)
      val coarse = IvfIndex.train(e, k = k, iters = 3)
      val assigned = IvfIndex.assignAuto(e, coarse).localCheckpoint()
      val probes = e.filter(col("vec_id") < 5).select(col("vec_id").as("q_id"), col("v").as("qv"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id").asc)
      val bf = e
        .join(broadcast(probes), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          graft.functions.CosineSimilarity.column(col("qv"), col("v")).as("cos"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("vec_id"))
        .localCheckpoint()
      val q = probes.count()
      for ((m, codes, short) <- Seq(
          (8, 16, 50), (8, 16, 100), (8, 64, 50), (8, 64, 100), (8, 256, 50), (16, 16, 50))) {
        val pq = IvfPq.train(assigned, coarse, m = m, nCodes = codes)
        val enc = IvfPq.encode(assigned, pq).localCheckpoint()
        val ann = IvfPq.searchPq(e, enc, probes, pq, nProbe, topK = 5, shortlist = short)
        val hits = ann.join(bf, Seq("q_id", "vec_id")).count()
        val bits = m * (math.log(codes) / math.log(2)).round
        println(f"PQ $dir m=$m codes=$codes shortlist=$short " +
          f"recall@5=${hits.toDouble / (5.0 * q)}%.3f codeBits=$bits")
      }
      // spilled composition (r15): train + encode on the margin-0.1
      // multi-assignment — the coarse-recall lever the plain-IVF gate
      // already rides; shortlist dedupes per (q_id, vec_id) on best ADC
      {
        // train/encode are per-(m,codes); only the shortlist varies
        val sp = IvfIndex.assignSpilled(e, coarse, spillMargin = 0.1).localCheckpoint()
        val pq = IvfPq.train(sp, coarse, m = 8, nCodes = 64)
        val enc = IvfPq.encode(sp, pq).localCheckpoint()
        for (short <- Seq(50, 100)) {
          val ann = IvfPq.searchPq(e, enc, probes, pq, nProbe, topK = 5, shortlist = short,
            spilled = true)
          val hits = ann.join(bf, Seq("q_id", "vec_id")).count()
          println(f"PQSPILL $dir m=8 codes=64 shortlist=$short " +
            f"recall@5=${hits.toDouble / (5.0 * q)}%.3f " +
            f"spillRows=${sp.count()} corpusRows=$n")
        }
      }
      // sample-capped training (r16): the per-(cl,sub) Lloyd group cap
      // that bounds task memory on skewed clusters — recall cost of
      // training books on a deterministic sample vs the full group
      // (groups at this SF are far under the 64k default, so the forced
      // caps below are the ONLY way they engage)
      for (cap <- Seq(65536, 256, 64, 16)) {
        val pq = IvfPq.train(assigned, coarse, m = 8, nCodes = 16, maxGroupSample = cap)
        val ann = IvfPq.searchPq(e, IvfPq.encode(assigned, pq), probes, pq,
          nProbe, topK = 5, shortlist = 50)
        val hits = ann.join(bf, Seq("q_id", "vec_id")).count()
        println(f"PQCAP $dir m=8 codes=16 shortlist=50 cap=$cap " +
          f"recall@5=${hits.toDouble / (5.0 * q)}%.3f")
      }
      // bytes per vector, measured on disk (parquet, snappy): the raw
      // float32 corpus vs SQ8 vs PQ codes (m=8, 16 codes)
      def bytesOf(df: org.apache.spark.sql.DataFrame, name: String): Long = {
        val p = s"/root/repo/tmp/pq_bytes/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/$name"
        df.write.mode("overwrite").parquet(p)
        new java.io.File(p).listFiles.filter(f => f.isFile && f.getName.endsWith(".parquet"))
          .map(_.length).sum
      }
      val pq8 = IvfPq.train(assigned, coarse, m = 8, nCodes = 16)
      val rawB = bytesOf(Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")), "raw")
      val sq8B = bytesOf(
        Quantize.withQuantized(e, "v").select(col("vec_id"), col("q"), col("q_scale")), "sq8")
      // 4-bit codes packed two-per-byte — the at-rest layout
      val pack = udf { (codes: Seq[Int]) =>
        codes.grouped(2).map(p => (((p.head << 4) | p.last) & 0xff).toByte).toArray
      }
      val pqB = bytesOf(
        IvfPq.encode(assigned, pq8)
          .select(col("vec_id"), col("cl"), pack(col("codes")).as("packed")),
        "pq")
      println(f"BYTES $dir n=$n raw=${rawB / n}%d B/vec sq8=${sq8B / n}%d B/vec pq=${pqB / n}%d B/vec")
    }
    spark.stop()
  }
}
