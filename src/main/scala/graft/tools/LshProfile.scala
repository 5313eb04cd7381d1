package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Diagnostic CLI: stage timings of the sign-LSH near-dup plan at sf0.1
  * (native SignBandKeys signature vs the retired composed-cosine form,
  * candidate join, full operator). */
object LshProfile {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    graft.functions.GraftExtensions.register(spark)
    val dir = "/root/testdata/sf0.1"
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROF $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    time("corpus count")(e.count())
    time("native sig (64 band keys)")(
      e.select(col("vec_id"),
        graft.functions.SignBandKeys.keysColumn(col("v"), 4, 64, 9001L).as("ks"))
        .filter(size(col("ks")) > 0).count())
    val sim = graft.operators.Similarity
    time("lshCandidates")(sim.lshCandidates(e, 4, 64).count())
    time("full embedNearDupLsh")(sim.embedNearDupLsh(e, 0.4, 4, 64).count())
    time("full again (warm)")(sim.embedNearDupLsh(e, 0.4, 4, 64).count())
    spark.stop()
  }
}
