package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** The one-Spark-job-per-merge-round BPE trainer — TEST SCOPE ONLY
  * (r16): strictly dominated by `Bpe.trainMergesFast` (identical merge
  * sequence, ~80× faster at depth — SCALING.md r15), it survives solely
  * as the cross-engine EQUALITY ANCHOR: its vocab update is the literal
  * Spark `replace` expression, the exact recurrence the DuckDB oracle
  * spells as a recursive CTE, so BpeSpec equating fast ≡ this ≡ oracle
  * closes the chain. Production code has exactly one trainer.
  */
object BpeReferenceTrainer {

  /** Greedy BPE training: N merge patterns in rank order. Deterministic
    * by construction — (freq DESC, pattern ASC) argmax each round. */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int): Seq[String] = {
    var vocab = Bpe.vocabOf(docs, textCol).localCheckpoint()
    val merges = Seq.newBuilder[String]
    var r = 0
    var exhausted = false
    while (r < nMerges && !exhausted) {
      val best = vocab
        .select(col("f"), explode(Bpe.pairsExpr).as("pr"))
        .groupBy(col("pr"))
        .agg(sum(col("f")).as("c"))
        .orderBy(col("c").desc, col("pr").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val bp = best.head.getString(0)
        merges += bp
        vocab = vocab.withColumn("word", replace(col("word"), lit(bp), lit(Bpe.repOf(bp))))
        // bound the lineage: each round adds a replace on top of the last
        if (r % 8 == 7) vocab = vocab.localCheckpoint()
      }
      r += 1
    }
    merges.result()
  }
}
